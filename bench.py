"""Benchmark: end-to-end VO throughput at 512x384 on the TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 60 FPS (2x real-time) at 512x384 on one v5e chip
(BASELINE.md). Synthetic in-memory frames isolate device throughput from
disk decode (the real pipeline overlaps decode via io.stream.Prefetcher).
"""

import argparse
import json
import sys
import time

import numpy as np

HT, WD = 384, 512
BASELINE_FPS = 60.0


def synthetic_frames(n, ht=HT, wd=WD, seed=0):
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 255, size=(ht + 256, wd + 256, 3),
                       dtype=np.uint8)
    # smooth it a bit so gradients are natural
    frames = []
    for t in range(n):
        y, x = (5 * t) % 256, (7 * t) % 256
        frames.append(np.ascontiguousarray(big[y:y + ht, x:x + wd]))
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/fast.yaml")
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--warmup", type=int, default=25)
    ap.add_argument("--buffer", type=int, default=256)
    ap.add_argument("--loop", action="store_true",
                    help="enable async loop closure (measures LC-mode FPS)")
    ap.add_argument("--fused", action="store_true",
                    help="A/B: fused Pallas kernel (in-kernel extraction)")
    ap.add_argument("--chunk", type=int, default=8,
                    help="steady-state frames per lax.scan dispatch "
                         "(PIPELINE_CHUNK); 1 = per-frame dispatch")
    args = ap.parse_args()

    # A dead relay tunnel makes jax.devices() hang forever (observed:
    # multi-hour axon outages). Probe in a subprocess first so the driver
    # gets a parseable failure line instead of a timeout.
    import os
    import subprocess
    if os.environ.get("JAX_PLATFORMS", "") not in ("cpu",):
        try:
            p = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=420, capture_output=True)
            ok = p.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if not ok:
            print(json.dumps({
                "metric": "vo_fps_512x384_fast48", "value": 0.0,
                "unit": "fps", "vs_baseline": 0.0,
                "error": "TPU backend unreachable (relay tunnel down)"}))
            return 0

    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache: repeated bench runs skip XLA compiles
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from wild_video_3d_reconstruction_tpu.slam import DPVO
    from wild_video_3d_reconstruction_tpu.utils.config import load_config

    cfg = load_config(args.config, BUFFER_SIZE=args.buffer,
                      PIPELINE_CHUNK=args.chunk,
                      **({"loop_enabled": True} if args.loop else {}),
                      **({"PALLAS_FUSED": True} if args.fused else {}))

    slam = DPVO(cfg, None, HT, WD, seed=0)
    if args.loop:
        from wild_video_3d_reconstruction_tpu.loop.longterm import \
            LongTermLoopClosure
        slam.loop_closure = LongTermLoopClosure(cfg, slam)
    # random weights would stall the motion-probe gate; force acceptance so
    # the benchmark exercises the full steady-state tracking path
    slam._probe = lambda *a: 100.0

    intr = np.array([400.0, 400.0, WD / 2, HT / 2])
    frames = synthetic_frames(args.frames)

    # chunked mode: feed raw numpy — DPVO stacks PIPELINE_CHUNK frames and
    # makes ONE device transfer + ONE scan dispatch per chunk. Unchunked
    # mode: upload-ahead double buffering (what io.stream.Prefetcher does
    # with device_upload=True) so the copy overlaps device compute.
    dev_frames = None
    if args.chunk <= 1:
        dev_frames = [None] * len(frames)
        dev_frames[0] = jax.device_put(frames[0])

    t_start = None
    ev_start = 0
    for t, img in enumerate(frames):
        if dev_frames is None:
            slam(t, img, intrinsics=intr)
        else:
            slam(t, dev_frames[t], intrinsics=intr)
            dev_frames[t] = None
            if t + 1 < len(frames):
                dev_frames[t + 1] = jax.device_put(frames[t + 1])
        if (t_start is None and t + 1 >= args.warmup
                and slam.is_initialized and not slam._pending):
            # start timing on a chunk-flush boundary; a VALUE fetch is the
            # only true device sync on a relay-attached TPU
            # (block_until_ready returns immediately there)
            _ = np.asarray(slam.state.poses[:1])
            t_start = time.perf_counter()
            ev_start = slam._events_dispatched
    # drain any partial chunk with repeated frames so every counted frame
    # actually executes before the closing sync
    extra = 0
    while slam._pending:
        slam(len(frames) + extra, frames[extra % len(frames)],
             intrinsics=intr)
        extra += 1
    _ = np.asarray(slam.state.poses[:1])
    elapsed = time.perf_counter() - t_start
    n_timed = slam._events_dispatched - ev_start
    fps = n_timed / elapsed

    import os.path
    cfg_tag = os.path.splitext(os.path.basename(args.config))[0]
    tag = {"fast": "fast48", "default": "default384",
           "mid": "mid192"}.get(cfg_tag, cfg_tag)
    print(json.dumps({
        "metric": f"vo_fps_512x384_{tag}" + ("_loop" if args.loop else ""),
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
