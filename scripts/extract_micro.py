"""Micro-bench: window-extraction formulations for the corr surface.

The v1 path extracts per-pixel 8x8 windows from [ns, 9, 16, 32] surfaces
with 21 masked static-shift passes (4 coarse-x + 8 fine-x + 9 y); measured
~95 ms of the 128 ms full corr at default capacity — the sequential
where-add chains compile to separate full-array passes. Candidates:

  shifts   the current 3-stage masked-shift chain
  select   jnp.select over the shift candidates (single expression)
  gather   ONE take_along_axis over the flattened 512-lane surface with
           fused (rel_y+dy)*32+rel_x+dx indices, then bilinear blend
  gather9  take_along_axis of the 9x9 neighborhood then blend locally

Run: python -u scripts/extract_micro.py [--ns 221184]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RSH, RSW = 16, 32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=int, default=221184)
    ap.add_argument("--n", type=int, default=15)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    ns = args.ns
    rng = np.random.default_rng(0)
    surf = jnp.asarray(rng.normal(size=(ns, 9, RSH, RSW)), jnp.bfloat16)
    rel_y = jnp.asarray(rng.integers(0, RSH - 8 + 1, (ns, 9)), jnp.int32)
    rel_x = jnp.asarray(rng.integers(0, RSW - 8 + 1, (ns, 9)), jnp.int32)
    fx = jnp.asarray(rng.random((ns, 9)), jnp.float32)
    fy = jnp.asarray(rng.random((ns, 9)), jnp.float32)

    def timeit(fn, *a):
        for _ in range(3):
            out = fn(*a)
        _ = np.asarray(out.ravel()[:1])
        t0 = time.perf_counter()
        for _ in range(args.n):
            out = fn(*a)
        _ = np.asarray(out.ravel()[:1])
        return (time.perf_counter() - t0) / args.n * 1000.0

    def blend(win, fx_, fy_):
        fx_b = fx_[:, :, None, None]
        fy_b = fy_[:, :, None, None]
        d = 7
        return ((1 - fx_b) * (1 - fy_b) * win[..., :d, :d]
                + fx_b * (1 - fy_b) * win[..., :d, 1:]
                + (1 - fx_b) * fy_b * win[..., 1:, :d]
                + fx_b * fy_b * win[..., 1:, 1:])

    # ---- current shifts ------------------------------------------------
    def shifts(surf, rel_y, rel_x, fx_, fy_):
        coarse_x = rel_x // 8
        fine_x = rel_x % 8
        surf_p = jnp.pad(surf, ((0, 0), (0, 0), (0, 0), (0, 8)))
        t1 = jnp.zeros((ns, 9, RSH, 16), jnp.bfloat16)
        for c in range(RSW // 8):
            m = (coarse_x == c)[:, :, None, None]
            t1 = t1 + jnp.where(m, surf_p[:, :, :, 8 * c:8 * c + 16],
                                0).astype(jnp.bfloat16)
        t2 = jnp.zeros((ns, 9, RSH, 8), jnp.bfloat16)
        for f in range(8):
            m = (fine_x == f)[:, :, None, None]
            t2 = t2 + jnp.where(m, t1[:, :, :, f:f + 8],
                                0).astype(jnp.bfloat16)
        win = jnp.zeros((ns, 9, 8, 8), jnp.float32)
        for s in range(RSH - 8 + 1):
            m = (rel_y == s)[:, :, None, None]
            win = win + jnp.where(m, t2[:, :, s:s + 8, :],
                                  0).astype(jnp.float32)
        return blend(win, fx_, fy_)

    t = timeit(jax.jit(shifts), surf, rel_y, rel_x, fx, fy)
    print(f"shifts (current):   {t:8.2f} ms")

    # ---- jnp.select ----------------------------------------------------
    def select(surf, rel_y, rel_x, fx_, fy_):
        coarse_x = rel_x // 8
        fine_x = rel_x % 8
        surf_p = jnp.pad(surf, ((0, 0), (0, 0), (0, 0), (0, 8)))
        t1 = jnp.select(
            [(coarse_x == c)[:, :, None, None] for c in range(4)],
            [surf_p[:, :, :, 8 * c:8 * c + 16] for c in range(4)])
        t2 = jnp.select(
            [(fine_x == f)[:, :, None, None] for f in range(8)],
            [t1[:, :, :, f:f + 8] for f in range(8)])
        win = jnp.select(
            [(rel_y == s)[:, :, None, None] for s in range(9)],
            [t2[:, :, s:s + 8, :] for s in range(9)]).astype(jnp.float32)
        return blend(win, fx_, fy_)

    t = timeit(jax.jit(select), surf, rel_y, rel_x, fx, fy)
    print(f"select:             {t:8.2f} ms")

    # ---- single gather over flattened lanes ---------------------------
    def gather(surf, rel_y, rel_x, fx_, fy_):
        sf = surf.reshape(ns, 9, RSH * RSW)
        dy = jnp.arange(8)
        dx = jnp.arange(8)
        idx = ((rel_y[:, :, None, None] + dy[None, None, :, None]) * RSW
               + rel_x[:, :, None, None] + dx[None, None, None, :])
        win = jnp.take_along_axis(sf, idx.reshape(ns, 9, 64), axis=2)
        return blend(win.reshape(ns, 9, 8, 8).astype(jnp.float32),
                     fx_, fy_)

    t = timeit(jax.jit(gather), surf, rel_y, rel_x, fx, fy)
    print(f"gather (64):        {t:8.2f} ms")

    # ---- gather the 9x9 neighborhood, blend locally -------------------
    def gather9(surf, rel_y, rel_x, fx_, fy_):
        sf = surf.reshape(ns, 9, RSH * RSW)
        d9 = jnp.arange(9)
        idx = ((rel_y[:, :, None, None] + d9[None, None, :, None]) * RSW
               + rel_x[:, :, None, None] + d9[None, None, None, :])
        win9 = jnp.take_along_axis(sf, idx.reshape(ns, 9, 81), axis=2)
        w = win9.reshape(ns, 9, 9, 9).astype(jnp.float32)
        fx_b = fx_[:, :, None, None]
        fy_b = fy_[:, :, None, None]
        d = 7
        return ((1 - fx_b) * (1 - fy_b) * w[..., :d, :d]
                + fx_b * (1 - fy_b) * w[..., :d, 1:d + 1]
                + (1 - fx_b) * fy_b * w[..., 1:d + 1, :d]
                + fx_b * fy_b * w[..., 1:d + 1, 1:d + 1])

    t = timeit(jax.jit(gather9), surf, rel_y, rel_x, fx, fy)
    print(f"gather9 (81):       {t:8.2f} ms")

    # numerics cross-check
    a = np.asarray(jax.jit(shifts)(surf, rel_y, rel_x, fx, fy)[:64],
                   np.float32)
    b = np.asarray(jax.jit(gather)(surf, rel_y, rel_x, fx, fy)[:64],
                   np.float32)
    print("shifts-vs-gather max diff:",
          float(np.abs(a - b).max()))


if __name__ == "__main__":
    main()
