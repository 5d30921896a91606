"""Measure per-call Python-side blocking time in the steady-state loop."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from wild_video_3d_reconstruction_tpu.slam import DPVO
from wild_video_3d_reconstruction_tpu.utils.config import load_config

HT, WD = 384, 512
cfg = load_config("configs/fast.yaml", BUFFER_SIZE=256)
slam = DPVO(cfg, None, HT, WD, seed=0)
slam._probe = lambda *a: 100.0
rng = np.random.default_rng(0)
big = rng.integers(0, 255, (HT + 256, WD + 256, 3), dtype=np.uint8)
intr = np.array([400.0, 400.0, WD / 2, HT / 2])

sections = {"upload_img": [], "upload_fac": [], "dispatch": [], "call": []}

orig_frame = dict(slam._frame)


def timed_frame(sig):
    fn = orig_frame[sig]

    def wrapper(state, params, img, intr_, fac, dep, msk):
        t0 = time.perf_counter()
        out = fn(state, params, img, intr_, fac, dep, msk)
        sections["dispatch"].append(time.perf_counter() - t0)
        return out
    return wrapper


for k in list(slam._frame):
    slam._frame[k] = timed_frame(k)

t_wall0 = None
for t in range(80):
    y, x = (5 * t) % 256, (7 * t) % 256
    img = np.ascontiguousarray(big[y:y + HT, x:x + WD])
    if t >= 25:
        u0 = time.perf_counter()
        dimg = jnp.asarray(img)
        sections["upload_img"].append(time.perf_counter() - u0)
        u0 = time.perf_counter()
        dfac = jnp.float32(1.0 + 0.001 * t)
        sections["upload_fac"].append(time.perf_counter() - u0)
        c0 = time.perf_counter()
        slam(t, dimg, intrinsics=intr)
        sections["call"].append(time.perf_counter() - c0)
    else:
        slam(t, img, intrinsics=intr)
    if t == 24:
        _ = np.asarray(slam.state.poses[:1])
        t_wall0 = time.perf_counter()
_ = np.asarray(slam.state.poses[:1])
wall = time.perf_counter() - t_wall0
n = len(sections["call"])
print(f"steady frames: {n}  wall {wall*1000:.1f} ms  -> {n/wall:.2f} FPS")
for k, v in sections.items():
    a = np.array(v) * 1000
    if len(a):
        print(f"{k:12s} ms: mean {a.mean():.2f} p50 {np.percentile(a,50):.2f}"
              f" p90 {np.percentile(a,90):.2f} max {a.max():.2f}")
