"""Per-component hot-path profiling on the real TPU (fast config).

Times each sub-step of the steady-state frame loop with value-fetch sync
(the only true sync on a relay-attached TPU). Not part of the test suite —
a development tool for the FPS optimization ledger.
"""

import argparse
import time

import numpy as np


def timeit(fn, sync, n=30, warmup=5):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/fast.yaml")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--opts", nargs="*", default=[],
                    help="config overrides KEY=VALUE (yaml-parsed)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from wild_video_3d_reconstruction_tpu.slam import DPVO, steps
    from wild_video_3d_reconstruction_tpu.utils.config import load_config

    import yaml
    over = {}
    for kv in args.opts:
        k, v = kv.split("=", 1)
        over[k] = yaml.safe_load(v)

    HT, WD = 384, 512
    cfg = load_config(args.config, BUFFER_SIZE=256, **over)
    print(f"overrides: {over}")
    slam = DPVO(cfg, None, HT, WD, seed=0)
    slam._probe = lambda *a: 100.0

    rng = np.random.default_rng(0)
    big = rng.integers(0, 255, (HT + 256, WD + 256, 3), dtype=np.uint8)
    intr = np.array([400.0, 400.0, WD / 2, HT / 2])
    for t in range(args.frames):
        y, x = (5 * t) % 256, (7 * t) % 256
        slam(t, np.ascontiguousarray(big[y:y + HT, x:x + WD]),
             intrinsics=intr)
    _ = np.asarray(slam.state.poses[:1])
    state = slam.state
    params = slam.params
    print(f"state ready: n_frames={int(state.n_frames)}, "
          f"n_edges={int(state.n_edges)}, E_cap={state.ii.shape[0]}")

    key = jax.random.PRNGKey(7)
    img = jnp.asarray(big[:HT, :WD])
    intr_j = jnp.asarray(intr, jnp.float32)

    def sync_state(s):
        _ = np.asarray(s.poses[0] if hasattr(s, "poses") else s)

    def sync_any(x):
        # slice ON DEVICE before fetching — np.asarray(leaf).ravel() would
        # pull the whole tensor through the relay (hundreds of MB for the
        # correlation output) and time the transfer, not the compute
        leaf = jax.tree.leaves(x)[0]
        _ = np.asarray(leaf.ravel()[:1])

    # full frame_step
    f_full = slam._frame[(False, False)]
    zero_img = jnp.zeros((1, 1), jnp.float32)
    zmask = zero_img > 0
    t_full = timeit(lambda: f_full(state, params, img, intr_j,
                                   jnp.float32(1.0), zero_img, zmask),
                    sync_state)
    print(f"frame_step (full)            {t_full:7.2f} ms")

    # insert only
    f_insert = jax.jit(lambda s: steps.insert_frame(
        cfg, params, s, img, intr_j, key, jnp.float32(1.0), None,
        initialized=True))
    t_ins = timeit(lambda: f_insert(state), sync_state)
    print(f"  insert_frame               {t_ins:7.2f} ms")

    f_append = jax.jit(lambda s: steps.append_edges(cfg, s))
    t_app = timeit(lambda: f_append(state), sync_state)
    print(f"  append_edges               {t_app:7.2f} ms")

    # update_op parts: run_update_net (corr + net) and BA separately
    f_runnet = jax.jit(lambda s: steps._run_update_net(
        cfg, params, s, s.net, s.ii, s.jj, s.kk, s.valid, s.n_frames))
    t_net = timeit(lambda: f_runnet(state), sync_any)
    print(f"  _run_update_net (corr+GRU) {t_net:7.2f} ms")

    # correlation alone
    def corr_only(s):
        from wild_video_3d_reconstruction_tpu.ops import projective as pops
        from wild_video_3d_reconstruction_tpu.ops.pallas_corr import \
            patch_corr_pyramid_pallas
        M, pmem = cfg.PATCHES_PER_FRAME, cfg.pmem
        coords = pops.transform(s.poses, s.patches, s.intrinsics,
                                s.ii, s.jj, s.kk)
        coords = jnp.where(s.valid[:, None, None, None], coords, 0.0)
        return patch_corr_pyramid_pallas(
            s.gmap, (s.fmap1, s.fmap2), coords.astype(jnp.float32),
            jnp.mod(s.kk, M * pmem), jnp.mod(s.jj, pmem),
            radius=3, valid=s.valid)
    f_corr = jax.jit(corr_only)
    t_corr = timeit(lambda: f_corr(state), sync_any)
    print(f"    corr (reproj+pallas)     {t_corr:7.2f} ms")

    f_upd = jax.jit(lambda s: steps.update_op(
        cfg, params, s, jnp.maximum(s.n_frames - cfg.OPTIMIZATION_WINDOW,
                                    1)))
    t_upd = timeit(lambda: f_upd(state), sync_state)
    print(f"  update_op (net+BA+points)  {t_upd:7.2f} ms")

    # BA alone
    from wild_video_3d_reconstruction_tpu.ba.gauss_newton import (
        BAConfig, bundle_adjust)

    def ba_only(s):
        M = cfg.PATCHES_PER_FRAME
        n = s.n_frames
        t0 = jnp.maximum(n - cfg.OPTIMIZATION_WINDOW, 1)
        m_base = jnp.maximum(n - (cfg.patch_window_frames - 1), 0) * M
        ba_cfg = BAConfig(window=cfg.ba_window, patch_slots=cfg.patch_slots,
                          iterations=2,
                          per_patch_cap=2 * cfg.PATCH_LIFETIME + 2)
        return bundle_adjust(s.poses, s.patches, s.intrinsics[0], s.target,
                             s.weight, 1e-4, s.ii, s.jj, s.kk, s.valid,
                             t0, n, m_base, ba_cfg)
    f_ba = jax.jit(ba_only)
    t_ba = timeit(lambda: f_ba(state), sync_any)
    print(f"    bundle_adjust (2 GN)     {t_ba:7.2f} ms")

    f_kf = jax.jit(lambda s: steps.track_and_keyframe(cfg, params, s))
    t_kf = timeit(lambda: f_kf(state), sync_state)
    print(f"  track_and_keyframe         {t_kf:7.2f} ms")

    f_ret = jax.jit(lambda s: steps.retire_and_compact(cfg, s))
    t_ret = timeit(lambda: f_ret(state), sync_state)
    print(f"  retire_and_compact         {t_ret:7.2f} ms")

    f_fm = jax.jit(lambda s: steps.flow_metric(
        cfg, s, s.n_frames - cfg.KEYFRAME_INDEX - 1,
        s.n_frames - cfg.KEYFRAME_INDEX + 1))
    t_fm = timeit(lambda: f_fm(state), sync_any)
    print(f"  flow_metric                {t_fm:7.2f} ms")


if __name__ == "__main__":
    main()
