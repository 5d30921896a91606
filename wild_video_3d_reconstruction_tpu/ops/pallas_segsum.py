"""Run-structured segment sums on the MXU (Pallas TPU).

`jax.ops.segment_sum` lowers to TPU scatter-adds that run at ~38 GB/s
effective (the r4/r5 ledgers bill the SoftAgg kk-aggregation scatter at
5-6 ms/update at default-config tiers). But the SLAM update already
holds a stable sort of the edge table by patch key (the okq_prefix BA
table order), under which each segment's members are a CONTIGUOUS RUN
bounded by the per-patch edge cap (2*PATCH_LIFETIME + 2 <= 28 by the
edge-lifecycle construction, `dpvo/dpvo.py:751-769`). That turns the
scatter into a banded matrix product: for sorted row i,

    out[i] = sum_j (seg[j] == seg[i]) * fes[j],   |j - i| < run bound

so each R-row block needs only its own rows plus OV=128 neighbor rows
on each side — computed as one [R, R+2*OV] inline one-hot times the
windowed rows on the MXU. No carries, no dynamic writes, no scatters;
out[i] is simultaneously the segment total AND the per-row readback the
SoftAgg expansion wants.

Correctness bound: runs longer than OV=128 rows would truncate; the
edge lifecycle caps live edges per patch at 2r+2 (27 during bootstrap),
and the sentinel run (invalid rows) is the only long one — its outputs
are never read (invalid rows carry zero weights and are masked by the
caller). Pinned vs `jax.ops.segment_sum` in tests/test_pallas_segsum.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 512      # rows per block
OV = 128      # overlap rows on each side (>= max live run length)


def _runsum_kernel(seg_h_ref, seg_m_ref, seg_t_ref, fes_h_ref, fes_m_ref,
                   fes_t_ref, out_ref):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    R = seg_m_ref.shape[0]

    # window = [head OV | main R | tail OV] rows; head/tail blocks clamp
    # at the array ends and are masked out there (their runs cannot
    # continue past the array anyway)
    seg_w = jnp.concatenate([seg_h_ref[:], seg_m_ref[:], seg_t_ref[:]],
                            axis=0)                     # [R + 2*OV, 1]
    w_ids = jax.lax.broadcasted_iota(jnp.int32, (R + 2 * OV, 1), 0)
    # scalar-arithmetic bounds (a vector-i1 select here fails to legalize
    # in some Mosaic toolchains: "arith.select on vector<8x128xi1>")
    lo = jnp.int32(OV) * (b == 0).astype(jnp.int32)
    hi = jnp.int32(R + 2 * OV) - \
        jnp.int32(OV) * (b == nb - 1).astype(jnp.int32)
    w_ok = (w_ids >= lo) & (w_ids < hi)
    seg_w = jnp.where(w_ok, seg_w, jnp.int32(-1))       # -1 never matches

    # seg of the main rows as a lane row [1, R] (diagonal mask-reduce —
    # Mosaic-friendly transpose of a [R, 1] column)
    rr = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    seg_i = jnp.sum(jnp.where(rr == cc, seg_m_ref[:], 0), axis=0,
                    keepdims=True)                      # [1, R]

    A = (seg_w == seg_i).astype(jnp.float32)            # [R + 2*OV, R]
    fes_w = jnp.concatenate([fes_h_ref[:], fes_m_ref[:], fes_t_ref[:]],
                            axis=0)                     # [R + 2*OV, D]
    out_ref[:] = jax.lax.dot_general(
        A, fes_w, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # [R, D]


def run_segment_sum_sorted(fes, seg_sorted):
    """Per-row segment (run) sums of sort-ordered rows.

    fes: [E, D] fp32 rows in segment-sorted order; seg_sorted: [E] int32
    (equal ids contiguous, runs < OV rows). Returns [E, D] fp32 where
    row i holds the total of row i's run. E must be a multiple of RB.
    """
    E, D = fes.shape
    assert E % RB == 0 and E >= RB
    nb = E // RB
    seg2 = seg_sorted.astype(jnp.int32).reshape(E, 1)
    nh = E // OV                                        # head/tail units

    grid_spec = pl.GridSpec(
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((OV, 1), lambda b: (jnp.maximum(b * (RB // OV)
                                                         - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((OV, 1), lambda b: (jnp.minimum(
                (b + 1) * (RB // OV), nh - 1), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((OV, D), lambda b: (jnp.maximum(b * (RB // OV)
                                                         - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, D), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((OV, D), lambda b: (jnp.minimum(
                (b + 1) * (RB // OV), nh - 1), 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RB, D), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _runsum_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((E, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(48e6)),
    )(seg2, seg2, seg2, fes, fes, fes)
