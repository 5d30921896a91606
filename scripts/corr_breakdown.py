"""Stage breakdown of the v1 Pallas correlation path at a given edge size.

Times, at default-config shapes: (a) the Pallas surface kernel alone,
(b) one full pyramid level (kernel + masked-shift extraction + blend),
(c) the complete 2-level path incl. the final unsort gather, and
(d) supporting index builders (bucketing). Directs the optimization ledger
at whichever stage actually dominates (VERDICT r2 #2).

Run: python -u scripts/corr_breakdown.py [--e 221184] [--live-frac 0.8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--e", type=int, default=221184)
    ap.add_argument("--live-frac", type=float, default=0.8)
    ap.add_argument("--frames", type=int, default=36)
    ap.add_argument("--m", type=int, default=384)
    ap.add_argument("--ht", type=int, default=96)     # 384/4
    ap.add_argument("--wd", type=int, default=128)    # 512/4
    ap.add_argument("--c", type=int, default=128)
    ap.add_argument("--n", type=int, default=15)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from wild_video_3d_reconstruction_tpu.ops import pallas_corr as pc

    E, F, C = args.e, args.frames, args.c
    H, W = args.ht, args.wd
    M = args.m
    rng = np.random.default_rng(0)
    live = int(E * args.live_frac)

    gmap = jnp.asarray(rng.normal(size=(F * M, C, 3, 3)), jnp.float32)
    fmap1 = jnp.asarray(rng.normal(size=(F, H, W, C)), jnp.float32)
    fmap2 = jnp.asarray(rng.normal(size=(F, H // 4, W // 4, C)),
                        jnp.float32)
    coords = jnp.asarray(
        rng.uniform(4, min(H, W) - 8, size=(E, 3, 3, 2)), jnp.float32)
    kk = jnp.asarray(rng.integers(0, F * M, E), jnp.int32)
    jj = jnp.asarray(np.sort(rng.integers(0, F, E)), jnp.int32)
    valid = jnp.asarray(np.arange(E) < live)

    def timeit(fn, n=args.n, warmup=3):
        for _ in range(warmup):
            out = fn()
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        return (time.perf_counter() - t0) / n * 1000.0

    eb = pc.EB_LARGE if E >= pc.EB_SWITCH else pc.EB
    n_slots = ((E + eb - 1) // eb) * eb + (F + 1) * eb

    f_bucket = jax.jit(lambda jj_, v: pc._bucket_by_frame(
        jj_, F, n_slots, valid=v, eb=eb))
    t = timeit(lambda: f_bucket(jj, valid))
    print(f"bucketing (2 argsorts):     {t:8.2f} ms")

    bucketing = jax.tree.map(jnp.asarray, f_bucket(jj, valid))
    slot_edge, slot_of_edge, block_meta = bucketing

    def gslots():
        # production formulation: transform/pad the SMALL table once,
        # one composed gather straight into slot order
        S = gmap.shape[0]
        g_small = jnp.moveaxis(gmap, 1, -1).reshape(S, 9, C)
        g_small = jnp.pad(g_small, ((0, 1), (0, pc.P16 - 9), (0, 0))
                          ).astype(jnp.bfloat16)
        kk_pad = jnp.concatenate(
            [kk.astype(jnp.int32), jnp.full((1,), S, jnp.int32)])
        return g_small[kk_pad[slot_edge]]
    f_g = jax.jit(gslots)
    t = timeit(f_g)
    print(f"g gather (small-table):     {t:8.2f} ms")
    g_slots = jnp.asarray(f_g())

    # surfaces kernels alone (both levels, via the diagnostic flag — the
    # same traced path the production call compiles). Arrays ride as jit
    # ARGUMENTS: closed-over constants embed in the HLO and blow the
    # remote-compile request limit (observed HTTP 413 at ~80 MB).
    f_surf = jax.jit(lambda g, f1, f2, c, k_, j_, v: (
        pc.patch_corr_pyramid_pallas(g, (f1, f2), c, k_, j_, radius=3,
                                     valid=v, _surfaces_only=True)))
    t = timeit(lambda: f_surf(gmap, fmap1, fmap2, coords, kk, jj, valid))
    print(f"surface kernels (2 levels): {t:8.2f} ms")

    # complete 2-level path
    f_all = jax.jit(lambda g, f1, f2, c, k_, j_, v: (
        pc.patch_corr_pyramid_pallas(g, (f1, f2), c, k_, j_, radius=3,
                                     valid=v)))
    t = timeit(lambda: f_all(gmap, fmap1, fmap2, coords, kk, jj, valid))
    print(f"full pyramid (2 lvl+unsort):{t:8.2f} ms")


if __name__ == "__main__":
    main()
