"""Micro-bench: per-frame argsort-based index builders at default sizes.

frame_step sorts the edge table several times per frame (corr bucketing,
neighbor links, BA patch grouping, retirement compaction). TPU sorts are
O(E log E) bitonic networks; at default-config capacities (221k rows) they
may rival the matmul stages. This script times each builder and the raw
argsort so the optimization ledger knows whether sort dedup/elimination is
worth it.

Run: python -u scripts/sort_micro.py [--e 221184] [--m 9600]
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
    ap.add_argument("--m", type=int, default=9600)
    ap.add_argument("--cap", type=int, default=28)
    ap.add_argument("--frames", type=int, default=36)
    ap.add_argument("--n", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from wild_video_3d_reconstruction_tpu.ba.gauss_newton import \
        _group_by_patch
    from wild_video_3d_reconstruction_tpu.ops.pallas_corr import \
        _bucket_by_frame
    from wild_video_3d_reconstruction_tpu.ops.segment import (compact_valid,
                                                              neighbors)

    E, M, F = args.e, args.m, args.frames
    rng = np.random.default_rng(0)
    live = int(0.8 * E)
    kk = jnp.asarray(rng.integers(0, M, E), jnp.int32)
    jj = jnp.asarray(np.sort(rng.integers(0, F, E)), jnp.int32)
    valid = jnp.asarray(np.arange(E) < live)
    q = kk
    okq = valid

    def timeit(fn, n=args.n, warmup=3):
        for _ in range(warmup):
            out = fn()
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        return (time.perf_counter() - t0) / n * 1000.0

    f_sort = jax.jit(lambda k: jnp.argsort(k, stable=True))
    print(f"argsort [E={E}]:          {timeit(lambda: f_sort(kk)):8.2f} ms")

    eb = 128
    n_slots = ((E + eb - 1) // eb) * eb + (F + 1) * eb
    f_bucket = jax.jit(lambda jj_, v: _bucket_by_frame(
        jj_, F, n_slots, valid=v, eb=eb))
    print(f"_bucket_by_frame:         "
          f"{timeit(lambda: f_bucket(jj, valid)):8.2f} ms")

    f_nbr = jax.jit(lambda k, j, v: neighbors(k, j, valid=v))
    print(f"neighbors:                "
          f"{timeit(lambda: f_nbr(kk, jj, valid)):8.2f} ms")

    f_grp = jax.jit(lambda q_, o: _group_by_patch(q_, o, M, args.cap))
    print(f"_group_by_patch:          "
          f"{timeit(lambda: f_grp(q, okq)):8.2f} ms")

    f_cmp = jax.jit(lambda v: compact_valid(v))
    print(f"compact_valid:            "
          f"{timeit(lambda: f_cmp(valid)):8.2f} ms")

    # ---- candidate replacement primitives ------------------------------
    # bounded-key rank via one-hot cumsum (frame bucketing has <= pmem+1
    # distinct keys) + a single int32 scatter for the inverse table
    def rank_cumsum(jj_, v):
        WJ = F + 1
        key = jnp.where(v, jj_, F)
        oh = (key[:, None] == jnp.arange(WJ)[None, :]).astype(jnp.int32)
        cum = jnp.cumsum(oh, axis=0)
        rank = jnp.take_along_axis(cum, key[:, None], axis=1)[:, 0] - 1
        return rank, cum[-1]

    f_rank = jax.jit(lambda j, v: rank_cumsum(j, v))
    print(f"rank via onehot-cumsum:   "
          f"{timeit(lambda: f_rank(jj, valid)):8.2f} ms")

    def scatter_inv(slot_of_edge):
        return jnp.full((E + F * 128,), E, jnp.int32).at[
            slot_of_edge].set(jnp.arange(E, dtype=jnp.int32), mode="drop")

    soe = jnp.asarray(rng.permutation(E + F * 128)[:E], jnp.int32)
    f_scat = jax.jit(scatter_inv)
    print(f"int32 scatter [E]:        "
          f"{timeit(lambda: f_scat(soe)):8.2f} ms")

    vals = jnp.asarray(rng.normal(size=(E, 15)), jnp.float32)
    f_seg = jax.jit(lambda v, q_: jax.ops.segment_sum(
        v, q_, num_segments=M))
    print(f"segment_sum [E,15]->[M]:  "
          f"{timeit(lambda: f_seg(vals, kk)):8.2f} ms")


if __name__ == "__main__":
    main()
