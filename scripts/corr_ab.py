"""A/B the v1 vs v2 (fused) Pallas correlation kernels on real TPU at a
given config's edge-table shape.

The v1 kernel writes full [P16, 512] correlation surfaces to HBM
(3.65 GB/level at default-config capacity) and extracts 8x8 windows with
12 masked XLA passes; v2 keeps the surface in VMEM and writes only the
blended windows (8x less out-traffic). v2 measured slower at fast-config
sizes (in-kernel VPU masking dominates when the tables are small) — this
script measures where the crossover is.

Run: python -u scripts/corr_ab.py [--config configs/default.yaml]
     [--live-frac 0.8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/default.yaml")
    ap.add_argument("--live-frac", type=float, default=0.8,
                    help="fraction of edge capacity holding live edges "
                         "(true steady state at default is ~0.6-0.8)")
    ap.add_argument("--n", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache (same dir bench.py uses)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from wild_video_3d_reconstruction_tpu.ops import projective as pops
    from wild_video_3d_reconstruction_tpu.ops.pallas_corr import \
        patch_corr_pyramid_pallas
    from wild_video_3d_reconstruction_tpu.slam import DPVO
    from wild_video_3d_reconstruction_tpu.utils.config import load_config

    HT, WD = 384, 512
    cfg = load_config(args.config, BUFFER_SIZE=256)
    slam = DPVO(cfg, None, HT, WD, seed=0)
    slam._probe = lambda *a: 100.0
    rng = np.random.default_rng(0)
    big = rng.integers(0, 255, (HT + 256, WD + 256, 3), dtype=np.uint8)
    intr = np.array([400.0, 400.0, WD / 2, HT / 2])
    for t in range(12):
        y, x = (5 * t) % 256, (7 * t) % 256
        slam(t, np.ascontiguousarray(big[y:y + HT, x:x + WD]),
             intrinsics=intr)
    _ = np.asarray(slam.state.poses[:1])
    state, params = slam.state, slam.params

    # densify the edge table to the requested live fraction: repeat the
    # live prefix pattern (sources/targets stay within the active window,
    # like true steady state after REMOVAL_WINDOW frames)
    E_cap = state.ii.shape[0]
    E_live = int(E_cap * args.live_frac)
    n_live = int(state.n_edges)
    reps = (E_live + n_live - 1) // n_live
    ii = np.tile(np.asarray(state.ii[:n_live]), reps)[:E_live]
    jj = np.tile(np.asarray(state.jj[:n_live]), reps)[:E_live]
    kk = np.tile(np.asarray(state.kk[:n_live]), reps)[:E_live]
    pad = E_cap - E_live
    state = state._replace(
        ii=jnp.asarray(np.concatenate([ii, np.zeros(pad, np.int32)])),
        jj=jnp.asarray(np.concatenate([jj, np.zeros(pad, np.int32)])),
        kk=jnp.asarray(np.concatenate([kk, np.zeros(pad, np.int32)])),
        valid=jnp.asarray(np.arange(E_cap) < E_live),
        n_edges=jnp.asarray(E_live, jnp.int32))
    print(f"E_cap={E_cap}, live={E_live} ({args.live_frac:.0%})")

    M, pmem = cfg.PATCHES_PER_FRAME, cfg.pmem

    def corr_only(s, fused):
        coords = pops.transform(s.poses, s.patches, s.intrinsics,
                                s.ii, s.jj, s.kk)
        coords = jnp.where(s.valid[:, None, None, None], coords, 0.0)
        return patch_corr_pyramid_pallas(
            s.gmap, (s.fmap1, s.fmap2), coords.astype(jnp.float32),
            jnp.mod(s.kk, M * pmem), jnp.mod(s.jj, pmem),
            radius=3, valid=s.valid, fused=fused)

    def timeit(fn, n=args.n, warmup=4):
        for _ in range(warmup):
            out = fn()
        _ = np.asarray(out.ravel()[0:1])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        _ = np.asarray(out.ravel()[0:1])
        return (time.perf_counter() - t0) / n * 1000.0

    f_v1 = jax.jit(lambda s: corr_only(s, False))
    f_v2 = jax.jit(lambda s: corr_only(s, True))
    t1 = timeit(lambda: f_v1(state))
    print(f"v1 (surface->HBM + XLA extract): {t1:8.2f} ms")
    t2 = timeit(lambda: f_v2(state))
    print(f"v2 (fused in-kernel extract):    {t2:8.2f} ms")
    # numerics cross-check on the live prefix
    a = np.asarray(f_v1(state)[:256], np.float32)
    b = np.asarray(f_v2(state)[:256], np.float32)
    scale = max(np.abs(a).max(), 1e-6)
    print(f"v1-vs-v2 max rel diff: {np.abs(a - b).max() / scale:.5f}")


if __name__ == "__main__":
    main()
