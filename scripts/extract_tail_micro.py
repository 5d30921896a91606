"""Measure the x16 corr FEATURE-ASSEMBLY tail in isolation (round 5).

corr_extract_ms (corr_full - surfaces) bundles: masked-shift selection +
bilinear blend + per-level (0,4,3,1,2) transpose into the reference
layout + 2-level stack + the [E, 882] unsort gather. This times the tail
pieces on tier-shaped dummies so the selection floor and the layout tax
are separated — if the layout tax dominates, a permuted corr-encoder
weight layout deletes it without touching the VPU selection floor.

Run: python -u scripts/extract_tail_micro.py [--e 66560]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--e", type=int, default=66560)
    ap.add_argument("--n", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    E = args.e
    eb = 128
    F = 36
    n_slots = ((E + eb - 1) // eb) * eb + (F + 1) * eb
    rng = np.random.default_rng(0)

    win1 = jnp.asarray(rng.normal(size=(n_slots, 9, 8, 8)), jnp.float32)
    win2 = jnp.asarray(rng.normal(size=(n_slots, 9, 8, 8)), jnp.float32)
    surf = jnp.asarray(
        rng.normal(size=(n_slots, 9, 256)).astype(np.float16),
        jnp.bfloat16)
    rel = jnp.asarray(rng.integers(0, 9, size=(n_slots, 9)), jnp.int32)
    frac = jnp.asarray(rng.random((n_slots, 9)), jnp.float32)
    slot_of_edge = jnp.asarray(rng.permutation(n_slots)[:E], jnp.int32)
    valid = jnp.asarray(np.arange(E) < int(0.86 * E))

    def timeit(fn, *a):
        out = fn(*a)
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        t0 = time.perf_counter()
        for _ in range(args.n):
            out = fn(*a)
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        return 1000.0 * (time.perf_counter() - t0) / args.n

    # ---- tail: blend output -> reference-layout features -> unsort ------
    def tail(w1, w2, soe, v):
        outs = []
        for w in (w1, w2):
            o = w[:, :, :7, :7]
            o = jnp.transpose(o.reshape(n_slots, 3, 3, 7, 7),
                              (0, 4, 3, 1, 2))
            outs.append(o.reshape(n_slots, -1).astype(jnp.bfloat16))
        feat = jnp.stack(outs, axis=-1).reshape(n_slots, -1)
        feat = feat[jnp.clip(soe, 0, n_slots - 1)].astype(jnp.float32)
        return jnp.where(v[:, None], feat, 0.0)

    # ---- tail WITHOUT the transpose (permuted-weights layout) -----------
    def tail_flat(w1, w2, soe, v):
        feat = jnp.concatenate(
            [w.reshape(n_slots, -1).astype(jnp.bfloat16)
             for w in (w1, w2)], axis=-1)               # [n_slots, 1152]
        feat = feat[jnp.clip(soe, 0, n_slots - 1)].astype(jnp.float32)
        return jnp.where(v[:, None], feat, 0.0)

    # ---- selection passes + blend only (x then y, as the x16 path) ------
    def select_blend(surf, rel, frac):
        s4 = surf.reshape(n_slots, 9, 16, 16)
        t2 = jnp.zeros((n_slots, 9, 16, 8), jnp.bfloat16)
        for f in range(9):
            m = (rel == f)[:, :, None, None]
            t2 = t2 + jnp.where(m, s4[:, :, :, f:f + 8],
                                0).astype(jnp.bfloat16)
        win = jnp.zeros((n_slots, 9, 8, 8), jnp.float32)
        for s in range(9):
            m = (rel == s)[:, :, None, None]
            win = win + jnp.where(m, t2[:, :, s:s + 8, :],
                                  0).astype(jnp.float32)
        fb = frac[:, :, None, None]
        d = 7
        return ((1 - fb) * (1 - fb) * win[..., :d, :d]
                + fb * (1 - fb) * win[..., :d, 1:]
                + (1 - fb) * fb * win[..., 1:, :d]
                + fb * fb * win[..., 1:, 1:])

    for name, fn, a in (
            ("tail (transpose+stack+unsort)", tail,
             (win1, win2, slot_of_edge, valid)),
            ("tail_flat (no transpose)", tail_flat,
             (win1, win2, slot_of_edge, valid)),
            ("select+blend one level", select_blend, (surf, rel, frac)),
    ):
        print(f"{name:<32s} {timeit(jax.jit(fn), *a):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
