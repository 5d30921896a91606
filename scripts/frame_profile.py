"""Fine-grained frame_step attribution at the engaged tier (round 5).

The r5 default-config breakdown leaves ~25 ms/frame unattributed
(frame_step 124 vs corr+net+BA+insert+retire ~99). This times every
sub-program of `frame_step` separately on a steady-state SLAM state:
insert, append, update_op, flow_metric, keyframe_and_log (cond + log +
retire), and both keyframe branches, so the residual is named.

Run: python -u scripts/frame_profile.py [--config configs/default.yaml]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HT, WD = 384, 512


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/default.yaml")
    ap.add_argument("--buffer", type=int, default=256)
    ap.add_argument("--n_feed", type=int, default=40)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    sys.path.insert(0, os.getcwd())
    from bench import synthetic_frames
    from wild_video_3d_reconstruction_tpu.slam import DPVO, steps
    from wild_video_3d_reconstruction_tpu.utils.config import load_config

    cfg = load_config(args.config, BUFFER_SIZE=args.buffer,
                      PIPELINE_CHUNK=16, PALLAS_VARIANT="x16")
    intr = np.array([400.0, 400.0, WD / 2, HT / 2])
    frames = synthetic_frames(args.n_feed + 4)
    slam = DPVO(cfg, None, HT, WD, seed=0)
    slam._probe = lambda *a: 100.0
    for t in range(args.n_feed):
        slam(t, frames[t], intrinsics=intr)
    _ = np.asarray(slam.state.poses[:1])
    state = slam.state
    params = slam.params
    print(f"n_edges={int(state.n_edges)} n_frames={int(state.n_frames)} "
          f"cap={state.ii.shape[0]}")

    def timeit(fn, *a):
        out = fn(*a)
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(*a)
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        return 1000.0 * (time.perf_counter() - t0) / args.reps

    img = jax.device_put(frames[0])
    intr_j = jnp.asarray(intr, jnp.float32)

    rows = []

    def stage(name, fn, *a):
        try:
            ms = timeit(fn, *a)
        except Exception as e:
            print(f"{name:<28s} FAILED {e!r}")
            return
        rows.append((name, ms))
        print(f"{name:<28s} {ms:8.2f} ms", flush=True)

    t0v = jnp.maximum(state.n_frames - cfg.OPTIMIZATION_WINDOW, 1)
    stage("frame_step", slam._frame[(False, False)], state, params, img,
          intr_j, jnp.float32(1.0), slam._zero_dep, slam._zero_msk)
    stage("insert_frame", jax.jit(lambda s: steps.insert_frame(
        cfg, params, s, img, intr_j, None, jnp.float32(1.0), None,
        initialized=True)), state)
    stage("append_edges", jax.jit(lambda s: steps.append_edges(cfg, s)),
          state)
    stage("update_op", jax.jit(lambda s: steps.update_op(cfg, params, s,
                                                         t0v)), state)
    i = state.n_frames - cfg.KEYFRAME_INDEX - 1
    j = state.n_frames - cfg.KEYFRAME_INDEX + 1
    stage("flow_metric", jax.jit(lambda s: steps.flow_metric(cfg, s, i, j)),
          state)
    stage("keyframe_and_log", jax.jit(
        lambda s: steps.keyframe_and_log(cfg, s)), state)
    stage("keyframe_shift(noretire)", jax.jit(
        lambda s: steps.keyframe_shift(cfg, s, retire=False)[0]), state)
    stage("retire_and_compact", jax.jit(
        lambda s: steps.retire_and_compact(cfg, s)), state)
    stage("track_and_keyframe", jax.jit(
        lambda s: steps.track_and_keyframe(cfg, params, s)), state)

    named = dict(rows)
    if "frame_step" in named:
        parts = (named.get("insert_frame", 0) + named.get("append_edges", 0)
                 + named.get("update_op", 0)
                 + named.get("keyframe_and_log", 0))
        print(f"\nsum(insert+append+update+kf)  {parts:8.2f} ms  "
              f"(frame_step {named['frame_step']:.2f}, "
              f"residual {named['frame_step'] - parts:+.2f})")


if __name__ == "__main__":
    main()
