"""Fused Pallas TPU kernel for the patch-correlation lookup.

Replaces the XLA gather path of `ops.corr` (measured 55-220 ms per update at
fast-config sizes on v5e — TPU gathers of ~10M scattered rows are slow) with
a region-matmul formulation that keeps everything in VMEM and feeds the MXU:

  1. Edges are sorted/bucketed by target frame slot so each kernel block
     processes EB edges sharing one frame; the (zero-padded) feature map of
     that frame is the block's VMEM-resident input (revisited blocks don't
     refetch).
  2. Per edge, one 16x32xC region covering all nine 8x8 correlation windows
     is copied from the frame tile into a stacked activation matrix
     A [EB*RN, C]. The x origin is 16-aligned (the bf16 VMEM tile is
     (16, 128)) so the copies are pure tile moves; y is an outer dim and
     needs no alignment.
  3. One transposed MXU matmul S = G @ A^T with pixel rows padded to a full
     sublane tile (P16=16) makes every per-edge diagonal-block slice
     exactly tile-aligned — the kernel contains zero Mosaic relayouts.
  4. The 8x8 windows at per-pixel offsets are extracted OUTSIDE the kernel
     by masked static-shift selection (x decomposed into 4 coarse + 8 fine
     shifts, then 9 y shifts — no gathers), then bilinearly blended —
     numerics matching `correlation_kernel.cu:83-136,221-232` in bf16.
  5. Invalid (capacity-padding) edges bucket into a tail group; their
     blocks alias the previous live block in the input index maps, so the
     pipeline's revisit detection elides their copies and pl.when skips
     their matmuls.

Variants (`patch_corr_pyramid_pallas(variant=...)`):
  * "x32" (v1): 16-aligned 32-column regions, RN=512 surfaces, 3+9+9
    extraction passes; per-pixel spread bound 24 - (min_x mod 16) px.
  * "x16" (v4): exact-x-origin 16-column regions carved by an
    int32-bitcast sublane rotate (Mosaic cannot load at unaligned
    sublane starts and only rotates 32-bit data), RN=256 surfaces,
    9+9 extraction passes; uniform 8 px spread bound. 46 vs 54 ms at
    the default 88k tier, bit-exact on bounded-spread coords; wins at
    fast-config sizes too (80.9 vs 77.1 FPS end-to-end).
  * hybrid (`hybrid_budget > 0`, x16 only): spread-clipped edges are
    recomputed through the x32 geometry on a static edge budget instead
    of zeroing their windows (the CUDA kernel samples exactly,
    `correlation_kernel.cu:83-136`; a truly exact XLA-gather fallback
    costs 3-13 us/edge and is not worth the residual tail). Clip count
    observable via `return_clip_count`.

Approximation: patch-pixel windows beyond the active variant's spread
bound (and past the hybrid budget) get zero correlation; the exact XLA
path remains available as oracle/fallback (cfg.PALLAS_CORR=False).

Measured on v5e (fast config, E=17408, 2 pyramid levels): ~9 ms vs 114 ms
for the best XLA gather formulation; end-to-end VO 7.2 -> 42+ FPS across
the optimization ledger (see git history).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EB = 32         # edges per kernel block (small edge tables)
# Mosaic stages ~256 B of SMEM per grid step for the data-dependent
# (scalar-prefetch-driven) index maps, and v5e has 1 MB of SMEM total.
# Large edge tables (default config: 221k-row capacity) must therefore use
# coarser blocks to keep n_blocks * 256 B * 2 pyramid levels under budget —
# observed AOT failure: "prefetched SMEM operand 0" at 1.4-3.5 MB with
# EB=32. 128-edge blocks cut the table 4x; measured compile-clean at
# E=221184 (both levels).
EB_LARGE = 128
EB_SWITCH = 65536  # edge tables at least this large use EB_LARGE
# The x (sublane) origin is 16-aligned — the bf16 VMEM tile is (16, 128),
# so coarser alignment makes the per-edge region copies pure tile moves.
# y is an outer (untiled) dim: unaligned, exact-min origin. The region
# covers alignment waste (x: <=15) + pixel spread (<=8) + the 8-px window.
RSH = 16        # region height
RSW = 32        # region width
PAD = 8         # fmap zero padding on each side
P2 = 9          # patch pixels (3x3)
P16 = 16        # pixels padded to one bf16 sublane tile
RN = RSH * RSW  # region positions per edge


def _corr_kernel(meta_ref, origin_ref, g_ref, fmap_ref, out_ref):
    # per-edge product G_e [P16, C] x region^T [C, RN] straight from the
    # tile-aligned region slice — no scratch, no diagonal extraction, no
    # Mosaic relayouts (x origin 16-aligned, pixel rows P16-padded).
    # bf16 output halves VMEM/HBM cost; the reference computes correlation
    # under fp16 autocast anyway (`dpvo/dpvo.py:716-720`).
    # Blocks with no live edge (capacity padding — the edge table is sized
    # for the no-eviction worst case) are aliased to the previous live
    # block in every BlockSpec index map, so the pipeline's block-revisit
    # detection skips their HBM<->VMEM copies (g: 128KB, out: 512KB per
    # block — the dominant cost when most capacity is dead) and pl.when
    # skips their matmuls. meta[b, 1] == b exactly for live blocks.
    b = pl.program_id(0)

    @pl.when(meta_ref[b, 1] == b)
    def _():
        for e in range(g_ref.shape[0]):       # block size (EB or EB_LARGE)
            oy = origin_ref[e, 0]
            ox = pl.multiple_of(origin_ref[e, 1], 16)
            region = fmap_ref[0, pl.ds(oy, RSH), pl.ds(ox, RSW), :]
            S = jax.lax.dot_general(
                g_ref[e], region.reshape(RN, -1), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [P16, RN]
            # store only the 9 live pixel rows: 44% less HBM out-traffic,
            # and the XLA extraction passes never need a slice copy
            out_ref[e, :, :] = S[:P2].astype(jnp.bfloat16)


# v4 region geometry: EXACT x origin (no 16-alignment), 16-column region.
# Halves the surface (RN4 = 256 vs 512), halves the per-edge MXU work, and
# shrinks the extraction to 9+9 shift passes over half-size arrays. The
# price is one dynamically-unaligned sublane read per edge (a Mosaic
# sublane rotate) and a UNIFORM <=8 px spread bound in x (v1's bound is
# 24 - (min_x mod 16), phase-dependent; the CUDA kernel has no bound —
# clipped edges are routed to the exact XLA path by the hybrid fallback
# in slam.steps).
RSW4 = 16
RN4 = RSH * RSW4


def _corr_kernel4(meta_ref, origin_ref, g_ref, fmap_ref, out_ref):
    # Mosaic cannot vector.load at a dynamically-unaligned sublane start
    # ("cannot statically prove index is a multiple of 8"), so the exact
    # 16-column region is carved in-register: one tile-aligned 32-column
    # load (as v1), then a dynamic sublane slice by the residual phase
    # r = min_x mod 16 (a sublane rotate).
    b = pl.program_id(0)

    @pl.when(meta_ref[b, 1] == b)
    def _():
        for e in range(g_ref.shape[0]):
            oy = origin_ref[e, 0]
            ox = pl.multiple_of(origin_ref[e, 1], 16)
            r = origin_ref[e, 2]                         # phase in [0, 15]
            reg32 = fmap_ref[0, pl.ds(oy, RSH), pl.ds(ox, RSW), :]
            # Mosaic's dynamic rotate is 32-bit only: bitcast the packed
            # bf16 sublane pairs to int32, rotate by the even part of the
            # phase (columns j of roll(-h) are reg32[j + 2h]; no wrap
            # reaches j < 16 for r <= 16), and resolve the odd bit with
            # one static-shift select.
            ri = pltpu.bitcast(reg32, jnp.int32)         # [RSH, RSW/2, C]
            ri = pltpu.roll(ri, -(r // 2), axis=1)
            rb = pltpu.bitcast(ri, jnp.bfloat16)         # [RSH, RSW, C]
            region = jnp.where((r % 2) == 1,
                               rb[:, 1:RSW4 + 1, :], rb[:, :RSW4, :])
            S = jax.lax.dot_general(
                g_ref[e], region.reshape(RN4, -1), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [P16, RN4]
            out_ref[e, :, :] = S[:P2].astype(jnp.bfloat16)


ECH = 16        # edges per extraction chunk (bounds live vector state)


def _corr_fused_kernel4(meta_ref, origin_ref, offs_ref, g_ref, fmap_ref,
                        out_ref, s_ref):
    """Fused x16 correlation (v5): the v4 rotate-carve matmul + in-kernel
    window extraction + bilinear blend.

    The unfused x16 path writes [n_slots, P2, RN4] surfaces to HBM and
    extracts windows with 9+9 masked-shift XLA passes streaming them back
    (the r4 default-config profile bills that extraction at ~16 ms/frame).
    Here the surfaces stay in a VMEM scratch and the selection passes run
    on VMEM-resident chunks — the r4 "flat-lane extraction is 2x slower"
    dead end measured HBM-streaming XLA passes, which is exactly the
    traffic this kernel deletes (out-traffic also drops 4x: [P16, 64]
    windows instead of [P16, 256] surfaces).

    Flat 128-lane layout (lane = wy*16 + x): rel_y/rel_x are both in
    [0, 8] for the x16 geometry, so selection is 9 y-shifts of 16-lane
    groups + 9 fine x-shifts — no coarse pass. Lane v of row wy holds
    window column v; v + fxi <= 15 keeps every used select in-row, and
    the v=7 / wy=7 blend wrap garbage is sliced off by the caller.
    """
    b = pl.program_id(0)

    @pl.when(meta_ref[b, 1] == b)
    def _():
        nE = g_ref.shape[0]
        for e in range(nE):            # unrolled: rotate-carve + matmul
            oy = origin_ref[e, 0]
            ox = pl.multiple_of(origin_ref[e, 1], 16)
            r = origin_ref[e, 2]
            reg32 = fmap_ref[0, pl.ds(oy, RSH), pl.ds(ox, RSW), :]
            ri = pltpu.bitcast(reg32, jnp.int32)
            ri = pltpu.roll(ri, -(r // 2), axis=1)
            rb = pltpu.bitcast(ri, jnp.bfloat16)
            region = jnp.where((r % 2) == 1,
                               rb[:, 1:RSW4 + 1, :], rb[:, :RSW4, :])
            S = jax.lax.dot_general(
                g_ref[e], region.reshape(RN4, -1), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [P16, RN4]
            s_ref[e] = S.astype(jnp.bfloat16)

        ech = min(ECH, nE)
        for c0 in range(0, nE, ech):
            S3 = s_ref[c0:c0 + ech]                      # [ech, P16, 256]
            offs = offs_ref[c0:c0 + ech]                 # [ech, P16, 8]
            rely = offs[:, :, 0:1]
            fxi = offs[:, :, 1:2]
            fx = offs[:, :, 2:3]
            fy = offs[:, :, 3:4]
            z16 = jnp.zeros((ech, P16, 16), jnp.bfloat16)
            # y-window selection: lane wy*16+x <- lane (rely+wy)*16+x
            t = jnp.zeros((ech, P16, 128), jnp.bfloat16)
            for s in range(RSH - 8 + 1):
                t = t + jnp.where(rely == s,
                                  S3[:, :, RSW4 * s:RSW4 * s + 128], 0)
            # x fine shift: lane wy*16+v <- lane wy*16+v+f (v+f <= 15)
            tp = jnp.concatenate([t, z16], axis=2)
            t = jnp.zeros((ech, P16, 128), jnp.bfloat16)
            for f in range(RSW4 - 8 + 1):
                t = t + jnp.where(fxi == f, tp[:, :, f:f + 128], 0)
            # bilinear blend of the four integer shifts (fp32)
            t32 = t.astype(jnp.float32)
            tpad = jnp.concatenate(
                [t32, jnp.zeros((ech, P16, 32), jnp.float32)], axis=2)
            out = ((1 - fx) * (1 - fy) * t32
                   + fx * (1 - fy) * tpad[:, :, 1:129]
                   + (1 - fx) * fy * tpad[:, :, 16:144]
                   + fx * fy * tpad[:, :, 17:145])
            outb = out.astype(jnp.bfloat16)
            out_ref[c0:c0 + ech] = jnp.concatenate(
                [outb[:, :, 16 * wy:16 * wy + 8] for wy in range(8)],
                axis=2)                                  # [ech, P16, 64]


def _extract_kernel4(offs_ref, surf_ref, out_ref):
    """Standalone window extraction + bilinear blend for x16 surfaces.

    Input: surf [SB, P16, RN4] bf16 (flat lane = y*16 + x) as written by
    `_corr_kernel4`; offs [SB, P16, 8] fp32 (lanes: rel_y, rel_x, fx, fy).
    Output: blended windows [SB, P16, 64] bf16, lane = wy*8 + wx (wy/wx = 7
    hold blend wrap garbage the caller slices off).

    This is the v5 fused kernel's phase 2 EXTRACTED into its own pipelined
    kernel: the fused variant lost (53.7 vs 28.3 ms) because its selection
    passes serialize behind the per-edge matmul loop inside one grid step,
    while the XLA masked-shift passes lose to layout/fusion overheads the
    measured numbers put at ~4x the stream cost. Here the whole block is
    processed in one vectorized pass chain (no per-chunk loop) while the
    grid pipeline overlaps the surface DMAs.
    """
    S3 = surf_ref[:]                                 # [SB, P16, 256]
    offs = offs_ref[:]                               # [SB, P16, 8]
    rely = offs[:, :, 0:1]
    fxi = offs[:, :, 1:2]
    fx = offs[:, :, 2:3]
    fy = offs[:, :, 3:4]
    SB = S3.shape[0]
    z16 = jnp.zeros((SB, P16, 16), jnp.bfloat16)
    # y-window selection: lane wy*16+x <- lane (rely+wy)*16+x
    t = jnp.zeros((SB, P16, 128), jnp.bfloat16)
    for s in range(RSH - 8 + 1):
        t = t + jnp.where(rely == s, S3[:, :, RSW4 * s:RSW4 * s + 128], 0)
    # x fine shift: lane wy*16+v <- lane wy*16+v+f (v+f <= 15 in-row)
    tp = jnp.concatenate([t, z16], axis=2)
    t = jnp.zeros((SB, P16, 128), jnp.bfloat16)
    for f in range(RSW4 - 8 + 1):
        t = t + jnp.where(fxi == f, tp[:, :, f:f + 128], 0)
    # bilinear blend of the four integer shifts (fp32)
    t32 = t.astype(jnp.float32)
    tpad = jnp.concatenate(
        [t32, jnp.zeros((SB, P16, 32), jnp.float32)], axis=2)
    out = ((1 - fx) * (1 - fy) * t32
           + fx * (1 - fy) * tpad[:, :, 1:129]
           + (1 - fx) * fy * tpad[:, :, 16:144]
           + fx * fy * tpad[:, :, 17:145])
    outb = out.astype(jnp.bfloat16)
    out_ref[:] = jnp.concatenate(
        [outb[:, :, 16 * wy:16 * wy + 8] for wy in range(8)],
        axis=2)                                      # [SB, P16, 64]


def _extract_windows4(surf, offs, n_slots):
    """Launch `_extract_kernel4` over slot blocks.

    surf: [n_slots, P2, RN4] bf16 (as `_surfaces4` returns);
    offs: [n_slots, P16, 8] fp32. Returns [n_slots, P16, 64] bf16.
    """
    SB = 128 if n_slots % 128 == 0 else 32
    # pad the pixel dim to the P16 sublane tile once here so the kernel's
    # flat-lane passes see full tiles (the surfaces kernel stores P2 rows)
    surf16 = jnp.concatenate(
        [surf, jnp.zeros((n_slots, P16 - P2, RN4), surf.dtype)], axis=1)
    return pl.pallas_call(
        _extract_kernel4,
        grid=(n_slots // SB,),
        in_specs=[
            pl.BlockSpec((SB, P16, 8), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SB, P16, RN4), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SB, P16, 64), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_slots, P16, 64), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(40e6)),
    )(offs, surf16)


def _surfaces_fused4(fmap_pad, block_meta, origin, offs, g, n_slots):
    """Run the fused x16 kernel; returns blended windows
    [n_slots, P16, 64] bf16, lane = wy*8 + wx (wy/wx = 7 garbage)."""
    F, Hp, Wp, C = fmap_pad.shape
    n_blocks = block_meta.shape[0]
    EB = n_slots // n_blocks

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((EB, 3), lambda b, meta: (meta[b, 1], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EB, P16, 8), lambda b, meta: (meta[b, 1], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EB, P16, C), lambda b, meta: (meta[b, 1], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hp, Wp, C),
                         lambda b, meta: (meta[b, 0], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((EB, P16, 64),
                               lambda b, meta: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((EB, P16, RN4), jnp.bfloat16)],
    )
    return pl.pallas_call(
        _corr_fused_kernel4,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_slots, P16, 64), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(40e6)),
    )(block_meta, origin, offs, g, fmap_pad)


def _corr_fused_kernel(meta_ref, origin_ref, offs_ref, g_ref, fmap_ref,
                       out_ref, s_ref):
    """Fused correlation: matmul surfaces + window extraction + bilinear
    blend in one kernel (v3).

    The v1 kernel writes the full [P16, RN] correlation surface to HBM
    (512 KB/block) and leaves the 8x8-window extraction to 12 masked XLA
    passes over it; at default-config edge counts that surface is
    gigabytes of HBM traffic per frame. Here the surfaces stay in a VMEM
    scratch: phase 1 is the v1 matmul loop (unrolled — the body is small
    enough at EB_LARGE), phase 2 runs the masked static-shift selection
    VECTORIZED across edge chunks in the flat 512-lane surface layout
    (lane = y*RSW + x), so the per-edge work is pure broadcast-compare
    selects with no per-edge loop overhead:

      y:  9 shifts of 32*s lanes   -> T[lane = wy*32 + x]
      x:  4 coarse (8c) + 8 fine (f) lane shifts -> T[lane = wy*32 + v],
          v = wx relative to the window start
      blend: (1-fx)(1-fy)T + fx(1-fy)T<<1 + (1-fx)fy T<<32 + fxfy T<<33
      compact: out lane wy*8+wx <- lane wy*32+wx  (wy/wx = 7 hold blend
          wrap garbage the caller slices off)

    Per-pixel offsets ride in one packed [EB, P16, 8] fp32 block (lanes:
    rely, cxi, fxi, fx, fy) so pixel sits on the sublane dim and the
    compare masks broadcast along lanes without relayouts. Only the
    blended [EB, P16, 64] window block leaves the kernel — 8x less out
    traffic than v1's surfaces.
    """
    b = pl.program_id(0)

    @pl.when(meta_ref[b, 1] == b)
    def _():
        nE = g_ref.shape[0]
        for e in range(nE):                   # unrolled, matmul+store only
            oy = origin_ref[e, 0]
            ox = pl.multiple_of(origin_ref[e, 1], 16)
            region = fmap_ref[0, pl.ds(oy, RSH), pl.ds(ox, RSW), :]
            S = jax.lax.dot_general(
                g_ref[e], region.reshape(RN, -1), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [P16, RN]
            s_ref[e] = S.astype(jnp.bfloat16)

        ech = min(ECH, nE)
        for c0 in range(0, nE, ech):
            S3 = s_ref[c0:c0 + ech]                      # [ech, P16, 512]
            offs = offs_ref[c0:c0 + ech]                 # [ech, P16, 8]
            rely = offs[:, :, 0:1]
            cxi = offs[:, :, 1:2]
            fxi = offs[:, :, 2:3]
            fx = offs[:, :, 3:4]
            fy = offs[:, :, 4:5]
            z32 = jnp.zeros((ech, P16, 32), jnp.bfloat16)
            # y-window selection: lane wy*32+x <- lane (rely+wy)*32+x
            t = jnp.zeros((ech, P16, 256), jnp.bfloat16)
            for s in range(RSH - 8 + 1):
                t = t + jnp.where(rely == s,
                                  S3[:, :, RSW * s:RSW * s + 256], 0)
            # x: coarse (8c) then fine (f) lane shifts; used lanes stay
            # within their wy*32 group (v + relx <= 31 for v <= 7)
            tp = jnp.concatenate([t, z32], axis=2)
            t = jnp.zeros((ech, P16, 256), jnp.bfloat16)
            for c in range(RSW // 8):
                t = t + jnp.where(cxi == c, tp[:, :, 8 * c:8 * c + 256], 0)
            tp = jnp.concatenate([t, z32], axis=2)
            t = jnp.zeros((ech, P16, 256), jnp.bfloat16)
            for f in range(8):
                t = t + jnp.where(fxi == f, tp[:, :, f:f + 256], 0)
            # bilinear blend of the four integer shifts (fp32)
            t32 = t.astype(jnp.float32)
            tpad = jnp.concatenate(
                [t32, jnp.zeros((ech, P16, 64), jnp.float32)], axis=2)
            out = ((1 - fx) * (1 - fy) * t32
                   + fx * (1 - fy) * tpad[:, :, 1:257]
                   + (1 - fx) * fy * tpad[:, :, 32:288]
                   + fx * fy * tpad[:, :, 33:289])
            outb = out.astype(jnp.bfloat16)
            out_ref[c0:c0 + ech] = jnp.concatenate(
                [outb[:, :, 32 * wy:32 * wy + 8] for wy in range(8)],
                axis=2)                                  # [ech, P16, 64]


def _surfaces_fused(fmap_pad, block_meta, origin, offs, g, n_slots):
    """Run the fused kernel; returns blended windows [n_slots, P16, 64]
    bf16 with lane = wy*8 + wx (wy/wx = 7 hold blend wrap garbage).
    """
    F, Hp, Wp, C = fmap_pad.shape
    n_blocks = block_meta.shape[0]
    EB = n_slots // n_blocks

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((EB, 2), lambda b, meta: (meta[b, 1], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EB, P16, 8), lambda b, meta: (meta[b, 1], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EB, P16, C), lambda b, meta: (meta[b, 1], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hp, Wp, C),
                         lambda b, meta: (meta[b, 0], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((EB, P16, 64),
                               lambda b, meta: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((EB, P16, RN), jnp.bfloat16)],
    )
    # VMEM budget at EB_LARGE=128: scratch 2 MB (512 lanes, no padding),
    # offs/out pad their minor dim to 128 lanes (1 MB / 0.5 MB), g 0.5 MB,
    # level-1 fmap block ~4 MB; double-buffered inputs land ~13 MB.
    return pl.pallas_call(
        _corr_fused_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_slots, P16, 64), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(40e6)),
    )(block_meta, origin, offs, g, fmap_pad)


def _surfaces(fmap_pad, block_meta, origin, g, n_slots):
    """Run the kernel over bucketed slots.

    fmap_pad: [F, Hp, Wp, C];  block_meta: [n_blocks, 2] int32 (scalar
    prefetch: frame id, source block — self for live blocks, previous
    live block for dead ones so their copies are revisit-elided)
    origin:   [n_slots, 2] int32;  g: [n_slots, P16, C] (pixels tile-padded)
    returns   [n_slots, P16, RN] bf16 surfaces
    """
    F, Hp, Wp, C = fmap_pad.shape
    n_blocks = block_meta.shape[0]
    EB = n_slots // n_blocks

    # NOTE: origin rides VMEM, not SMEM. SMEM-space pallas inputs are staged
    # in their ENTIRETY ("prefetched SMEM operand"), and at default-config
    # edge counts [n_slots, 2] int32 x 2 pyramid levels = 1.4-1.8 MB blows
    # the 1 MB SMEM budget (observed AOT failure on v5e). Per-edge scalar
    # reads from VMEM cost a vector extract each — 64 per block — which is
    # noise next to the block's 32 MXU matmuls.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((EB, 2), lambda b, meta: (meta[b, 1], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EB, P16, C), lambda b, meta: (meta[b, 1], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hp, Wp, C),
                         lambda b, meta: (meta[b, 0], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((EB, P2, RN), lambda b, meta: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _corr_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_slots, P2, RN), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(15e6)),
    )(block_meta, origin, g, fmap_pad)


def _surfaces4(fmap_pad, block_meta, origin, g, n_slots):
    """v4 kernel launcher: [n_slots, P2, RN4] bf16 surfaces."""
    F, Hp, Wp, C = fmap_pad.shape
    n_blocks = block_meta.shape[0]
    EB = n_slots // n_blocks

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((EB, 3), lambda b, meta: (meta[b, 1], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EB, P16, C), lambda b, meta: (meta[b, 1], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hp, Wp, C),
                         lambda b, meta: (meta[b, 0], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((EB, P2, RN4), lambda b, meta: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _corr_kernel4,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_slots, P2, RN4), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(15e6)),
    )(block_meta, origin, g, fmap_pad)


def _bucket_by_frame(jj, n_frames, n_slots, valid=None, eb=EB):
    """Group edge ids by target frame, each group padded to a multiple of
    eb. Returns (slot_edge [n_slots] with E = dummy, slot_of_edge [E],
    block_meta [n_slots/eb, 2] of (frame id, source block)).

    Invalid (capacity-padding) edges land in a dedicated tail group so
    their blocks alias a live one and the kernel skips them — the edge
    table is sized for the no-eviction worst case, so in a typical frame
    the majority of rows are dead and this skip tracks the live load.

    The frame key is bounded (ring-buffer slots, <= pmem+1 groups), so the
    grouping is a COUNTING bucketization: per-key rank via a one-hot
    cumsum + one int32 scatter for the inverse table. This replaced a
    2-argsort formulation measured at 38 ms/frame at default-config
    capacity (221k rows; TPU sorts are O(E log^2 E) bitonic networks) —
    the old path remains as `_bucket_by_frame_sort` and the counting
    result is pinned exactly equal in tests/test_pallas_corr.py."""
    E = jj.shape[0]
    if valid is None:
        valid = jnp.ones((E,), bool)
    WJ = n_frames + 1
    key = jnp.where(valid, jj, n_frames).astype(jnp.int32)
    oh = (key[:, None] == jnp.arange(WJ, dtype=jnp.int32)[None, :]
          ).astype(jnp.int32)                                # [E, WJ]
    cum = jnp.cumsum(oh, axis=0)
    rank = jnp.take_along_axis(cum, key[:, None], axis=1)[:, 0] - 1
    counts = cum[-1]                                         # [WJ]
    aligned = ((counts + eb - 1) // eb) * eb
    slot_starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         jnp.cumsum(aligned)[:-1].astype(jnp.int32)])        # [WJ]
    slot_of_edge = (slot_starts[key] + rank).astype(jnp.int32)

    slot_edge = jnp.full((n_slots,), E, jnp.int32).at[slot_of_edge].set(
        jnp.arange(E, dtype=jnp.int32), mode="drop")

    # per-block metadata: groups are eb-aligned, so every block lies in
    # exactly one group — find it with a tiny searchsorted over [WJ]
    nb = n_slots // eb
    b0 = jnp.arange(nb, dtype=jnp.int32) * eb
    fidx = jnp.searchsorted(slot_starts, b0, side="right") - 1
    fidx = jnp.clip(fidx, 0, WJ - 1)
    frame_of_block = jnp.clip(fidx, 0, n_frames - 1).astype(jnp.int32)
    block_live = (fidx < n_frames) & \
        (b0 - slot_starts[fidx] < counts[fidx])
    src = jnp.maximum(jax.lax.cummax(
        jnp.where(block_live, jnp.arange(nb), -1)), 0).astype(jnp.int32)
    block_meta = jnp.stack([frame_of_block[src], src], axis=-1)
    return slot_edge, slot_of_edge, block_meta


def _bucket_by_frame_sort(jj, n_frames, n_slots, valid=None, eb=EB):
    """Reference argsort formulation of `_bucket_by_frame` (kept as the
    equality oracle for the counting path)."""
    E = jj.shape[0]
    if valid is None:
        valid = jnp.ones((E,), bool)
    key = jnp.where(valid, jj, n_frames)          # invalid -> tail group
    order = jnp.argsort(key, stable=True)
    jj_sorted = key[order]
    # per-group counts (n_frames + 1 groups) without bincount's scatter
    frames = jnp.arange(n_frames + 2)
    bounds = jnp.searchsorted(jj_sorted, frames)
    counts = bounds[1:] - bounds[:-1]
    aligned = ((counts + eb - 1) // eb) * eb
    slot_starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                   jnp.cumsum(aligned)[:-1].astype(jnp.int32)])
    rank_starts = bounds[:-1].astype(jnp.int32)
    r = jnp.arange(E)
    slot_of_sorted = slot_starts[jj_sorted] + (r - rank_starts[jj_sorted])

    # slot -> edge: binary search the increasing slot assignment
    s = jnp.arange(n_slots)
    pos = jnp.searchsorted(slot_of_sorted, s)
    hit = (pos < E) & (slot_of_sorted[jnp.clip(pos, 0, E - 1)] == s)
    slot_edge = jnp.where(hit, order[jnp.clip(pos, 0, E - 1)], E
                          ).astype(jnp.int32)

    # edge -> slot: compose with the inverse permutation (double argsort)
    inv = jnp.argsort(order, stable=True)
    slot_of_edge = slot_of_sorted[inv].astype(jnp.int32)

    # block -> (frame, any-valid-edge flag): frame of the block's first
    # slot (dummy/invalid-only blocks inherit a clipped neighbor, whose
    # fmap fetch hits the pipeline cache and whose compute is skipped)
    b0 = jnp.arange(n_slots // eb) * eb
    posb = jnp.clip(jnp.searchsorted(slot_of_sorted, b0), 0, E - 1)
    frame_of_block = jnp.clip(jj_sorted[posb], 0, n_frames - 1
                              ).astype(jnp.int32)
    valid_pad = jnp.concatenate([valid, jnp.zeros((1,), bool)])
    block_live = jnp.any(valid_pad[jnp.clip(slot_edge, 0, E)]
                         .reshape(-1, eb), axis=1)
    # dead blocks alias the previous live block (cummax of live indices);
    # leading dead blocks clamp to 0 and compute garbage that is never
    # gathered — src == b is the kernel's liveness test
    nb = n_slots // eb
    src = jnp.maximum(jax.lax.cummax(
        jnp.where(block_live, jnp.arange(nb), -1)), 0).astype(jnp.int32)
    block_meta = jnp.stack([frame_of_block[src], src], axis=-1)
    return slot_edge, slot_of_edge, block_meta


def _fused_level(gmap_slots, fmap_pad, origin, coords_e, rel_y, rel_x,
                 in_region, n_slots, bucketing):
    """Fused-kernel path: pack the slot-ordered per-pixel offsets into one
    [n_slots, P16, 8] fp32 block, run `_surfaces_fused`, and unpack to the
    v1 layout [n_slots, P2, 7, 7] fp32 (slot order)."""
    E = coords_e.shape[0]
    slot_edge, _, block_meta = bucketing

    fy = (coords_e[..., 1] - jnp.floor(coords_e[..., 1])).reshape(E, P2)
    fx = (coords_e[..., 0] - jnp.floor(coords_e[..., 0])).reshape(E, P2)

    def to_slots(a, fill=0):
        a_p = jnp.concatenate(
            [a, jnp.full((1,) + a.shape[1:], fill, a.dtype)], axis=0)
        a_s = a_p[slot_edge]                            # [n_slots, P2]
        pad = jnp.zeros((n_slots, P16 - P2), a.dtype)
        return jnp.concatenate([a_s, pad], axis=1)

    offs = jnp.stack([                                 # lane: see kernel
        to_slots(rel_y.astype(jnp.float32)),
        to_slots((rel_x // 8).astype(jnp.float32)),
        to_slots((rel_x % 8).astype(jnp.float32)),
        to_slots(fx.astype(jnp.float32)),
        to_slots(fy.astype(jnp.float32)),
        jnp.zeros((n_slots, P16), jnp.float32),
        jnp.zeros((n_slots, P16), jnp.float32),
        jnp.zeros((n_slots, P16), jnp.float32)], axis=-1)

    win = _surfaces_fused(
        fmap_pad.astype(jnp.bfloat16), block_meta, origin[slot_edge],
        offs, gmap_slots, n_slots)                     # [n_slots, P16, 64]
    out = win[:, :P2].reshape(n_slots, P2, 8, 8)[:, :, :7, :7] \
        .astype(jnp.float32)                           # [n_slots, P2, 7, 7]
    inreg = to_slots(in_region.astype(jnp.float32))[:, :P2]
    return out * inreg[:, :, None, None]


def _pallas_corr_level(gmap_slots, fmap, coords_e, jj, n_slots, bucketing,
                       fused=False):
    """One pyramid level, computed in SLOT order.

    gmap_slots: [n_slots, P16, C] patch features already bucketed;
    fmap: [F, H, W, C]; coords_e [E, P, P, 2] at this level's scale;

    bucketing: (slot_edge, slot_of_edge, block_meta).

    Returns blended correlation [n_slots, P2, 7, 7] fp32 in slot order —
    the caller unsorts once on the final stacked feature (much cheaper
    than unsorting the raw surfaces). Out-of-image window positions are
    exactly zero (zero padding); out-of-region pixels are zeroed.
    """
    E = coords_e.shape[0]
    F, H, W, C = fmap.shape
    slot_edge, slot_of_edge, block_meta = bucketing

    # pad by the window reach, plus whatever is needed so the padded map is
    # at least one region large (tiny pyramid levels)
    pad_h = max(PAD, RSH - (H + PAD))
    pad_w = max(PAD, RSW - (W + PAD))
    fmap_pad = jnp.pad(fmap, ((0, 0), (PAD, pad_h), (PAD, pad_w), (0, 0)))
    Hp = H + PAD + pad_h
    Wp = W + PAD + pad_w

    ystart = jnp.floor(coords_e[..., 1]).astype(jnp.int32) - 3 + PAD
    xstart = jnp.floor(coords_e[..., 0]).astype(jnp.int32) - 3 + PAD
    ystart = ystart.reshape(E, P2)
    xstart = xstart.reshape(E, P2)

    # region origin: cover as many window starts as possible; the x origin
    # is rounded down to a bf16-tile multiple (16) so the in-kernel region
    # copies are pure tile moves
    oy = jnp.clip(jnp.min(ystart, axis=1), 0, Hp - RSH)
    ox = jnp.clip((jnp.min(xstart, axis=1) // 16) * 16, 0,
                  ((Wp - RSW) // 16) * 16)
    rel_y = ystart - oy[:, None]
    rel_x = xstart - ox[:, None]
    fits = ((rel_y >= 0) & (rel_y <= RSH - 8) &
            (rel_x >= 0) & (rel_x <= RSW - 8))
    inimg = ((ystart >= 0) & (xstart >= 0) &
             (ystart <= Hp - 8) & (xstart <= Wp - 8))
    in_region = fits & inimg
    clip_e = jnp.any(inimg & ~fits, axis=1)        # [E]
    rel_y = jnp.clip(rel_y, 0, RSH - 8)
    rel_x = jnp.clip(rel_x, 0, RSW - 8)

    origin = jnp.stack([oy, ox], axis=-1)
    origin = jnp.concatenate([origin, jnp.zeros((1, 2), jnp.int32)], axis=0)

    if fused:
        return _fused_level(gmap_slots, fmap_pad, origin, coords_e,
                            rel_y, rel_x, in_region, n_slots,
                            bucketing), clip_e

    surf = _surfaces(fmap_pad.astype(jnp.bfloat16),
                     block_meta,
                     origin[slot_edge],
                     gmap_slots,
                     n_slots)                          # [n_slots, P2, RN]
    surf = surf.reshape(n_slots, P2, RSH, RSW)

    # reorder the per-pixel metadata into slot order (tiny arrays)
    def to_slots(a, fill=0):
        a_p = jnp.concatenate(
            [a, jnp.full((1,) + a.shape[1:], fill, a.dtype)], axis=0)
        return a_p[slot_edge]

    rel_y_s = to_slots(rel_y)
    rel_x_s = to_slots(rel_x)
    in_region_s = to_slots(in_region.astype(jnp.float32))
    fy = (coords_e[..., 1] - jnp.floor(coords_e[..., 1])).reshape(E, P2)
    fx = (coords_e[..., 0] - jnp.floor(coords_e[..., 0])).reshape(E, P2)
    fy_s = to_slots(fy)
    fx_s = to_slots(fx)

    # extract per-pixel 8x8 windows by shift-selection: the window start has
    # few possible values (y: 0..RSH-8, x: 0..RSW-8), so the dynamic crop is
    # a masked sum of static slices — pure VPU work, ~10x faster than the
    # equivalent batched one-hot matmuls and ~66x faster than a
    # take_along_axis lane gather at SLAM sizes (scripts/extract_micro.py;
    # folding the bilinear blends INTO the selection passes also measured
    # slower — the fp32 blend operands quadruple the per-candidate bytes).
    # A barrel-shifter formulation (4-5 conditional power-of-two shifts
    # per axis instead of 9-12 masked adds) measured ~2x SLOWER on v5e
    # (x32 33.6 -> 62.2 ms, x16 28.3 -> 40.0 at E=55k, r5): the masked
    # adds all read the SAME immutable source and XLA fuses the whole sum
    # into one pass, while the barrel stages form a serial chain of
    # pad+select copies. Do not retry without new evidence.
    # bf16 buffers: the masked sums are exact selections (exactly one mask
    # is 1 per position), so no accumulation error is introduced.
    # x runs first (it narrows 32 lanes to 8 before the y pass touches the
    # data), decomposed into a CLAMPED coarse shift (min(x//8, 2): 3
    # shifts of width 16, all in-bounds) and a widened fine shift
    # (x - 8*coarse in [0, 8]: 9 shifts of width 8, f+8 <= 16) — 12
    # passes, and the 2 GB padded surface copy the unclamped (4-coarse)
    # decomposition needed disappears (rel_x <= RSW-8 = 24 makes the
    # clamp exact).
    coarse_x = jnp.minimum(rel_x_s // 8, 2)
    fine_x = rel_x_s - 8 * coarse_x
    t1 = jnp.zeros((n_slots, P2, RSH, 16), jnp.bfloat16)
    for c in range(3):
        m = (coarse_x == c)[:, :, None, None]
        t1 = t1 + jnp.where(m, surf[:, :, :, 8 * c:8 * c + 16],
                            0).astype(jnp.bfloat16)
    t2 = jnp.zeros((n_slots, P2, RSH, 8), jnp.bfloat16)
    for f in range(9):
        m = (fine_x == f)[:, :, None, None]
        t2 = t2 + jnp.where(m, t1[:, :, :, f:f + 8], 0).astype(jnp.bfloat16)
    win = jnp.zeros((n_slots, P2, 8, 8), jnp.float32)
    for s in range(RSH - 8 + 1):
        m = (rel_y_s == s)[:, :, None, None]
        win = win + jnp.where(m, t2[:, :, s:s + 8, :], 0).astype(jnp.float32)
    win = win * in_region_s[:, :, None, None]

    # bilinear blend of the four integer shifts -> 7x7
    fx_b = fx_s[:, :, None, None]
    fy_b = fy_s[:, :, None, None]
    d = 7
    out = ((1 - fx_b) * (1 - fy_b) * win[..., :d, :d]
           + fx_b * (1 - fy_b) * win[..., :d, 1:]
           + (1 - fx_b) * fy_b * win[..., 1:, :d]
           + fx_b * fy_b * win[..., 1:, 1:])           # [n_slots,9,dy,dx]
    return out, clip_e


def _pallas_corr_level4(gmap_slots, fmap, coords_e, jj, n_slots, bucketing,
                        fused=False, extract="xla", rel_bound=RSH - 8):
    """v4: one pyramid level with exact-x 16-column regions (RN4 = 256).

    Same contract as `_pallas_corr_level` (slot-ordered [n_slots, P2, 7, 7]
    fp32, zero outside image/region) but the surface is half the size and
    the extraction needs only 9 x-shift + 9 y-shift passes. The x spread
    bound is a uniform 8 px (see _corr_kernel4 note). fused=True runs the
    v5 kernel (in-kernel extraction + blend, `_corr_fused_kernel4`);
    extract="pallas" keeps the surfaces kernel but runs the window
    selection + blend in the standalone `_extract_kernel4`.

    rel_bound < RSH-8 trims the XLA selection to rel offsets in
    [0, rel_bound] per axis (passes: rel_bound+1 each). The /4 pyramid
    level uses bound 3: a patch whose level-1 floors fit the 8-px region
    has real spread < 9 px, i.e. < 2.25 px at /4, i.e. floor spread <= 3
    — so the trim only zeroes pixels of edges that ALSO flag `fits` at
    this level (inimg & ~fits -> clip_e), which the hybrid fallback
    repairs under the existing approximation contract. Saves 10 of 18
    selection passes on the level (r5)."""
    E = coords_e.shape[0]
    F, H, W, C = fmap.shape
    slot_edge, slot_of_edge, block_meta = bucketing

    pad_h = max(PAD, RSH - (H + PAD))
    # the kernel's aligned pre-rotate load is RSW (32) wide even though
    # the carved region is RSW4 (16): pad tiny maps up to the full load.
    # Wp is then rounded up to a multiple of 16: the rotate-carve only
    # covers phase = ox - ox16 <= 16, and with Wp % 16 != 0 a right-edge
    # ox (clipped to Wp - RSW4) can sit up to 16 + Wp % 16 columns past
    # the last aligned load origin (Wp - RSW rounded down), where
    # pltpu.roll wraps and emits garbage columns that still pass `fits`.
    pad_w = max(PAD, RSW - (W + PAD))
    rb = min(rel_bound, RSH - 8)
    if rb < RSH - 8:
        # trimmed levels: the far-edge origin clamp (oy/ox clipped to
        # Hp-RSH / Wp-RSW4) can push rel to 8 even for tiny spreads. Pad
        # 8 more so every CONTENT-overlapping window's unclamped origin
        # stays in range (min_y <= PAD+H <= Hp-RSH); windows past the
        # content are all-zero, so trimming them is exact.
        pad_h += 8
        pad_w += 8
    pad_w += -(W + PAD + pad_w) % 16
    fmap_pad = jnp.pad(fmap, ((0, 0), (PAD, pad_h), (PAD, pad_w), (0, 0)))
    Hp = H + PAD + pad_h
    Wp = W + PAD + pad_w

    ystart = jnp.floor(coords_e[..., 1]).astype(jnp.int32) - 3 + PAD
    xstart = jnp.floor(coords_e[..., 0]).astype(jnp.int32) - 3 + PAD
    ystart = ystart.reshape(E, P2)
    xstart = xstart.reshape(E, P2)

    oy = jnp.clip(jnp.min(ystart, axis=1), 0, Hp - RSH)
    ox = jnp.clip(jnp.min(xstart, axis=1), 0, Wp - RSW4)
    rel_y = ystart - oy[:, None]
    rel_x = xstart - ox[:, None]
    # fits: the pixel's window sits inside the per-edge region (the
    # approximation); inimg: the window overlaps the padded image at all
    # (out-of-image zeros are EXACT — the CUDA kernel samples zero
    # padding too). Only fits&inimg pixels produce output; inimg&~fits
    # pixels are the approximation loss the hybrid fallback repairs.
    fits = ((rel_y >= 0) & (rel_y <= rb) &
            (rel_x >= 0) & (rel_x <= rb))
    inimg = ((ystart >= 0) & (xstart >= 0) &
             (ystart <= Hp - 8) & (xstart <= Wp - 8))
    in_region = fits & inimg
    clip_e = jnp.any(inimg & ~fits, axis=1)        # [E]
    rel_y = jnp.clip(rel_y, 0, rb)
    rel_x = jnp.clip(rel_x, 0, rb)

    # kernel loads an aligned 32-column tile and slices 16 at phase r
    # (lax.dynamic_slice clamps r to RSW - RSW4, which is exactly right
    # when the aligned origin was clipped at the right image edge)
    ox16 = jnp.clip((ox // 16) * 16, 0, ((Wp - RSW) // 16) * 16)
    phase = ox - ox16
    origin = jnp.stack([oy, ox16, phase], axis=-1)
    origin = jnp.concatenate([origin, jnp.zeros((1, 3), jnp.int32)], axis=0)

    if fused:
        fy = (coords_e[..., 1] - jnp.floor(coords_e[..., 1])).reshape(E, P2)
        fx = (coords_e[..., 0] - jnp.floor(coords_e[..., 0])).reshape(E, P2)

        def to_slots16(a, fill=0):
            a_p = jnp.concatenate(
                [a, jnp.full((1,) + a.shape[1:], fill, a.dtype)], axis=0)
            a_s = a_p[slot_edge]                        # [n_slots, P2]
            pad = jnp.zeros((n_slots, P16 - P2), a.dtype)
            return jnp.concatenate([a_s, pad], axis=1)

        offs = jnp.stack([
            to_slots16(rel_y.astype(jnp.float32)),
            to_slots16(rel_x.astype(jnp.float32)),
            to_slots16(fx.astype(jnp.float32)),
            to_slots16(fy.astype(jnp.float32)),
            jnp.zeros((n_slots, P16), jnp.float32),
            jnp.zeros((n_slots, P16), jnp.float32),
            jnp.zeros((n_slots, P16), jnp.float32),
            jnp.zeros((n_slots, P16), jnp.float32)], axis=-1)
        win = _surfaces_fused4(
            fmap_pad.astype(jnp.bfloat16), block_meta, origin[slot_edge],
            offs, gmap_slots, n_slots)                 # [n_slots, P16, 64]
        out = win[:, :P2].reshape(n_slots, P2, 8, 8)[:, :, :7, :7] \
            .astype(jnp.float32)
        inreg = to_slots16(in_region.astype(jnp.float32))[:, :P2]
        return out * inreg[:, :, None, None], clip_e

    surf = _surfaces4(fmap_pad.astype(jnp.bfloat16),
                      block_meta,
                      origin[slot_edge],
                      gmap_slots,
                      n_slots)                         # [n_slots, P2, RN4]

    if extract == "pallas":
        fy = (coords_e[..., 1] - jnp.floor(coords_e[..., 1])).reshape(E, P2)
        fx = (coords_e[..., 0] - jnp.floor(coords_e[..., 0])).reshape(E, P2)

        def to_slots16(a, fill=0):
            a_p = jnp.concatenate(
                [a, jnp.full((1,) + a.shape[1:], fill, a.dtype)], axis=0)
            a_s = a_p[slot_edge]                        # [n_slots, P2]
            pad = jnp.zeros((n_slots, P16 - P2), a.dtype)
            return jnp.concatenate([a_s, pad], axis=1)

        offs = jnp.stack([
            to_slots16(rel_y.astype(jnp.float32)),
            to_slots16(rel_x.astype(jnp.float32)),
            to_slots16(fx.astype(jnp.float32)),
            to_slots16(fy.astype(jnp.float32)),
            jnp.zeros((n_slots, P16), jnp.float32),
            jnp.zeros((n_slots, P16), jnp.float32),
            jnp.zeros((n_slots, P16), jnp.float32),
            jnp.zeros((n_slots, P16), jnp.float32)], axis=-1)
        win = _extract_windows4(surf, offs, n_slots)   # [n_slots, P16, 64]
        out = win[:, :P2].reshape(n_slots, P2, 8, 8)[:, :, :7, :7] \
            .astype(jnp.float32)
        inreg = to_slots16(in_region.astype(jnp.float32))[:, :P2]
        return out * inreg[:, :, None, None], clip_e

    surf = surf.reshape(n_slots, P2, RSH, RSW4)

    def to_slots(a, fill=0):
        a_p = jnp.concatenate(
            [a, jnp.full((1,) + a.shape[1:], fill, a.dtype)], axis=0)
        return a_p[slot_edge]

    rel_y_s = to_slots(rel_y)
    rel_x_s = to_slots(rel_x)
    in_region_s = to_slots(in_region.astype(jnp.float32))
    fy = (coords_e[..., 1] - jnp.floor(coords_e[..., 1])).reshape(E, P2)
    fx = (coords_e[..., 0] - jnp.floor(coords_e[..., 0])).reshape(E, P2)
    fy_s = to_slots(fy)
    fx_s = to_slots(fx)

    # masked static-shift selection, x then y (rel_x in [0, 8]: 9 shifts
    # of width 8 from the 16-column rows; f + 8 <= 16 stays in-bounds).
    # NOTE a flat 256-lane formulation of these passes (full minor-dim
    # width, lane = y*16+x) measured 2x SLOWER (88 vs 46 ms at E=88k on
    # v5e): early narrowing (16 -> 8 columns after the x pass) beats
    # lane-utilization games because later passes stream 2-16x fewer
    # bytes. Two more r5 dead ends: a barrel-shifter formulation (4
    # conditional power-of-two shifts per axis) measured 40.0 vs 28.3 ms
    # at E=55k — the masked adds read one immutable source and fuse into
    # a single XLA pass, the barrel is a serial pad+select copy chain —
    # and the v5 fused kernel (extraction in VMEM, `_corr_fused_kernel4`)
    # measured 53.7 vs 28.3 ms. Do not retry either without new evidence.
    t2 = jnp.zeros((n_slots, P2, RSH, 8), jnp.bfloat16)
    for f in range(rb + 1):
        m = (rel_x_s == f)[:, :, None, None]
        t2 = t2 + jnp.where(m, surf[:, :, :, f:f + 8],
                            0).astype(jnp.bfloat16)
    win = jnp.zeros((n_slots, P2, 8, 8), jnp.float32)
    for s in range(rb + 1):
        m = (rel_y_s == s)[:, :, None, None]
        win = win + jnp.where(m, t2[:, :, s:s + 8, :], 0).astype(jnp.float32)
    win = win * in_region_s[:, :, None, None]

    fx_b = fx_s[:, :, None, None]
    fy_b = fy_s[:, :, None, None]
    d = 7
    out = ((1 - fx_b) * (1 - fy_b) * win[..., :d, :d]
           + fx_b * (1 - fy_b) * win[..., :d, 1:]
           + (1 - fx_b) * fy_b * win[..., 1:, :d]
           + fx_b * fy_b * win[..., 1:, 1:])
    return out, clip_e


def patch_corr_pyramid_pallas(gmap, pyramid, coords, kk, jj, radius=3,
                              valid=None, levels=(1, 4), fused=False,
                              variant="x32", hybrid_budget=0,
                              return_clip_count=False,
                              _surfaces_only=False, extract="xla"):
    """Drop-in replacement for `ops.corr.patch_corr_pyramid` (radius 3).

    gmap: [Ek, C, P, P]; pyramid: per-level [F, H_l, W_l, C] channel-last;
    coords: [E, P, P, 2] at level-1 scale; kk/jj: [E] indices.
    fused=True runs the fused v3 kernel (in-kernel window extraction + blend).
    variant="x16" uses the v4 exact-x kernel (half-size surfaces, uniform
    8 px spread bound — see _corr_kernel4). extract="pallas" (x16 only)
    runs the window selection + bilinear blend in a standalone pipelined
    kernel (`_extract_kernel4`) instead of XLA masked-shift passes.
    Returns [E, L*(2R+1)^2*P*P] with the reference feature layout.
    """
    assert radius == 3, "kernel is specialized for the reference radius 3"
    E, Pp = coords.shape[0], coords.shape[1]
    C = gmap.shape[1]
    F = pyramid[0].shape[0]
    # coarser blocks above EB_SWITCH keep the Mosaic per-grid-step SMEM
    # table inside the 1 MB budget (see EB_LARGE note above)
    eb = EB_LARGE if E >= EB_SWITCH else EB
    # alignment slack for F frame groups plus the invalid-edge tail group
    n_slots = ((E + eb - 1) // eb) * eb + (F + 1) * eb

    # bucketing and patch features are shared across pyramid levels
    bucketing = _bucket_by_frame(jj, F, n_slots, valid=valid, eb=eb)
    slot_edge, slot_of_edge, _ = bucketing
    # transpose/pad the SMALL per-patch feature table (pmem*M rows), then
    # one composed gather straight into slot order — transposing after an
    # [E]-gather would stream ~3x the bytes at full edge capacity
    S = gmap.shape[0]
    g_small = jnp.moveaxis(gmap, 1, -1).reshape(S, P2, C)
    g_small = jnp.pad(g_small, ((0, 1), (0, P16 - P2), (0, 0))
                      ).astype(jnp.bfloat16)
    kk_pad = jnp.concatenate(
        [kk.astype(jnp.int32), jnp.full((1,), S, jnp.int32)])
    g_slots = g_small[kk_pad[slot_edge]]

    if _surfaces_only:
        # perf-diagnostic path (scripts/corr_breakdown.py, bench
        # --breakdown): run only the surface kernels + a cheap reduction,
        # isolating kernel time from the masked-shift extraction. Honors
        # `variant` so the bench's corr_extract_ms = full - surf subtracts
        # like from like (ADVICE r4).
        acc = 0.0
        for fmap, s in zip(pyramid, levels):
            c = coords.astype(jnp.float32) / s
            F2, H2, W2, C2 = fmap.shape
            pad_h = max(PAD, RSH - (H2 + PAD))
            pad_w = max(PAD, RSW - (W2 + PAD))
            if variant == "x16":
                pad_w += -(W2 + PAD + pad_w) % 16
            fmap_pad = jnp.pad(fmap.astype(jnp.bfloat16),
                               ((0, 0), (PAD, pad_h), (PAD, pad_w),
                                (0, 0)))
            Hp2 = H2 + PAD + pad_h
            Wp2 = W2 + PAD + pad_w
            ystart = jnp.floor(c[..., 1]).astype(jnp.int32) - 3 + PAD
            xstart = jnp.floor(c[..., 0]).astype(jnp.int32) - 3 + PAD
            oy = jnp.clip(jnp.min(ystart.reshape(E, P2), axis=1), 0,
                          Hp2 - RSH)
            if variant == "x16":
                ox = jnp.clip(jnp.min(xstart.reshape(E, P2), axis=1), 0,
                              Wp2 - RSW4)
                ox16 = jnp.clip((ox // 16) * 16, 0,
                                ((Wp2 - RSW) // 16) * 16)
                origin = jnp.concatenate(
                    [jnp.stack([oy, ox16, ox - ox16], -1),
                     jnp.zeros((1, 3), jnp.int32)])
                surf = _surfaces4(fmap_pad, bucketing[2],
                                  origin[slot_edge], g_slots, n_slots)
            else:
                ox = jnp.clip(
                    (jnp.min(xstart.reshape(E, P2), axis=1) // 16) * 16,
                    0, ((Wp2 - RSW) // 16) * 16)
                origin = jnp.concatenate(
                    [jnp.stack([oy, ox], -1), jnp.zeros((1, 2), jnp.int32)])
                surf = _surfaces(fmap_pad, bucketing[2], origin[slot_edge],
                                 g_slots, n_slots)
            acc = acc + jnp.sum(surf[:, 0, 0].astype(jnp.float32))
        return acc

    outs = []
    clips = []
    for fmap, s in zip(pyramid, levels):
        c = coords.astype(jnp.float32) / s
        if variant == "x16":
            # coarser pyramid levels inherit a tighter spread bound from
            # the level-1 fit (real spread < 9 px / s), so their
            # selection runs fewer passes (see _pallas_corr_level4)
            rb = RSH - 8 if s <= 1 else min(RSH - 8, int(9 // s) + 1)
            out, clip_e = _pallas_corr_level4(
                g_slots, fmap.astype(jnp.bfloat16), c, jj, n_slots,
                bucketing, fused=fused, extract=extract, rel_bound=rb)
        else:
            out, clip_e = _pallas_corr_level(
                g_slots, fmap.astype(jnp.bfloat16), c, jj, n_slots,
                bucketing, fused=fused)                # [n_slots,9,7,7]
        clips.append(clip_e)
        # reference layout: (dx, dy, pi, pj)
        out = jnp.transpose(out.reshape(n_slots, 3, 3, 7, 7),
                            (0, 4, 3, 1, 2))
        outs.append(out.reshape(n_slots, -1).astype(jnp.bfloat16))

    # one unsort gather on the final stacked features (E x 882 bf16)
    feat = jnp.stack(outs, axis=-1).reshape(n_slots, -1)
    feat = feat[jnp.clip(slot_of_edge, 0, n_slots - 1)].astype(jnp.float32)
    if valid is not None:
        # where (not multiply): skipped-block garbage can be NaN/inf and
        # NaN * 0 would poison the padded rows
        feat = jnp.where(valid[:, None], feat, 0.0)

    clip_any = clips[0]
    for ce in clips[1:]:
        clip_any = clip_any | ce
    if valid is not None:
        clip_any = clip_any & jnp.asarray(valid).astype(bool)

    if hybrid_budget > 0 and variant == "x16":
        # Hybrid exact-er fallback (VERDICT r3 #5): edges whose patch
        # spread exceeds the x16 region get recomputed through the x32
        # geometry (bound 9-24 px depending on alignment phase) on a
        # small static budget instead of keeping zeroed pixels. Beyond
        # the x32 bound the behavior is unchanged (zero) — the truly
        # exact XLA gather costs ~3-13 us/edge and is not worth it for
        # the residual tail. Overflowing the budget leaves the extra
        # edges on the fast path (the clip count is observable via
        # return_clip_count and the bench JSON).
        B = hybrid_budget
        r = jnp.cumsum(clip_any.astype(jnp.int32)) - 1
        pos = jnp.where(clip_any & (r < B), r, B)
        buf = jnp.full((B + 1,), E, jnp.int32).at[pos].set(
            jnp.arange(E, dtype=jnp.int32), mode="drop")[:B]
        ok = buf < E
        bc = jnp.clip(buf, 0, E - 1)
        sub_valid = (jnp.ones((B,), bool) if valid is None
                     else valid[bc]) & ok
        feat_sub = patch_corr_pyramid_pallas(
            gmap, pyramid, coords[bc], kk[bc], jj[bc], radius=radius,
            valid=sub_valid, levels=levels, variant="x32")
        ids = jnp.where(ok, buf, E)
        feat = jnp.concatenate(
            [feat, jnp.zeros((1, feat.shape[1]), feat.dtype)], axis=0)
        feat = feat.at[ids].set(feat_sub, mode="drop")[:E]

    if return_clip_count:
        return feat, jnp.sum(clip_any.astype(jnp.int32))
    return feat
