"""A/B the x16 window extraction: XLA masked-shift passes vs the
standalone Pallas extraction kernel (`_extract_kernel4`), at tier sizes.

The r5 profile bills extraction (corr_full - surfaces) at ~16 ms/frame at
the 55k tier while its stream cost is ~2-4 ms — this measures whether a
dedicated pipelined kernel (NOT the measured-dead-end in-matmul-kernel
fusion) recovers the gap, and pins exact agreement with the XLA passes.

Run: python -u scripts/extract_micro2.py [--e 55296]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--e", type=int, nargs="+", default=[55296])
    ap.add_argument("--frames", type=int, default=36)
    ap.add_argument("--m", type=int, default=384)
    ap.add_argument("--ht", type=int, default=96)
    ap.add_argument("--wd", type=int, default=128)
    ap.add_argument("--c", type=int, default=128)
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--spread", type=float, default=4.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from wild_video_3d_reconstruction_tpu.ops import pallas_corr as pc

    F, C = args.frames, args.c
    H, W = args.ht, args.wd
    M = args.m

    def timeit(fn, n=args.n, warmup=2):
        for _ in range(warmup):
            out = fn()
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        return (time.perf_counter() - t0) / n * 1000.0

    for E in args.e:
        rng = np.random.default_rng(0)
        live = int(E * 0.85)
        gmap = jnp.asarray(rng.normal(size=(F * M, C, 3, 3)), jnp.float32)
        fmap1 = jnp.asarray(rng.normal(size=(F, H, W, C)), jnp.float32)
        fmap2 = jnp.asarray(rng.normal(size=(F, H // 4, W // 4, C)),
                            jnp.float32)
        ctr = rng.uniform(6, min(H, W) - 10, size=(E, 1, 1, 2))
        off = rng.uniform(-args.spread / 2, args.spread / 2,
                         size=(E, 3, 3, 2))
        coords = jnp.asarray(ctr + off, jnp.float32)
        kk = jnp.asarray(rng.integers(0, F * M, E), jnp.int32)
        jj = jnp.asarray(np.sort(rng.integers(0, F, E)), jnp.int32)
        valid = jnp.asarray(np.arange(E) < live)

        fns = {}
        for name, kw in (("x16_xla", dict(variant="x16")),
                         ("x16_pallas", dict(variant="x16",
                                             extract="pallas")),
                         ("x16_fusedv5", dict(variant="x16", fused=True))):
            fns[name] = jax.jit(
                lambda g, f1, f2, c, k_, j_, v, kw=kw:
                pc.patch_corr_pyramid_pallas(
                    g, (f1, f2), c, k_, j_, radius=3, valid=v, **kw))

        outs = {}
        for name, f in fns.items():
            t = timeit(lambda: f(gmap, fmap1, fmap2, coords, kk, jj, valid))
            outs[name] = np.asarray(
                f(gmap, fmap1, fmap2, coords, kk, jj, valid))
            print(f"E={E:7d} {name}: {t:8.2f} ms", flush=True)
        d = np.abs(outs["x16_xla"] - outs["x16_pallas"]).max()
        print(f"E={E:7d} max|xla-pallas| = {d:.3e}")


if __name__ == "__main__":
    main()
