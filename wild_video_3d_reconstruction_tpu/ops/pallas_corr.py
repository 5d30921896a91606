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
     with two one-hot einsums (no gathers), then bilinearly blended —
     numerics matching `correlation_kernel.cu:83-136,221-232` in bf16.

Approximation: all nine patch-pixel windows of an edge must fit in the
region, i.e. the reprojected patch spread must be <= 8 px at the pyramid
level. Pixels exceeding it (extreme perspective) get zero correlation
rather than shifted samples; the exact XLA path remains available as
oracle/fallback (cfg.PALLAS_CORR=False).

Measured on v5e (fast config, E=17408, 2 pyramid levels): 28 ms vs 114 ms
for the best XLA gather formulation; end-to-end VO 7.2 -> 28.9 FPS.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EB = 8          # edges per kernel block
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


def _corr_kernel(frames_ref, origin_ref, g_ref, fmap_ref, out_ref, a_buf):
    # build the stacked region matrix A [EB*RN, C]
    for e in range(EB):
        oy = origin_ref[e, 0]
        ox = pl.multiple_of(origin_ref[e, 1], 16)
        region = fmap_ref[0, pl.ds(oy, RSH), pl.ds(ox, RSW), :]
        a_buf[e * RN:(e + 1) * RN, :] = region.reshape(RN, -1)

    # transposed product: rows = (edge, pixel) on sublanes (P16-padded), so
    # every diagonal-block slice below is exactly tile-aligned — no Mosaic
    # relayouts anywhere in this kernel
    G = g_ref[:].reshape(EB * P16, g_ref.shape[-1])
    S = jax.lax.dot_general(
        G, a_buf[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [EB*P16, EB*RN]

    # bf16 output halves VMEM/HBM cost; the reference computes correlation
    # under fp16 autocast anyway (`dpvo/dpvo.py:716-720`)
    for e in range(EB):
        out_ref[e, :, :] = S[e * P16:(e + 1) * P16,
                             e * RN:(e + 1) * RN].astype(jnp.bfloat16)


def _surfaces(fmap_pad, frames, origin, g, n_slots):
    """Run the kernel over bucketed slots.

    fmap_pad: [F, Hp, Wp, C];  frames: [n_blocks] int32 (scalar prefetch)
    origin:   [n_slots, 2] int32;  g: [n_slots, P16, C] (pixels tile-padded)
    returns   [n_slots, P16, RN] bf16 surfaces
    """
    F, Hp, Wp, C = fmap_pad.shape
    n_blocks = n_slots // EB

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((EB, 2), lambda b, frames: (b, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((EB, P16, C), lambda b, frames: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hp, Wp, C),
                         lambda b, frames: (frames[b], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((EB, P16, RN), lambda b, frames: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((EB * RN, C), jnp.bfloat16)],
    )
    return pl.pallas_call(
        _corr_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_slots, P16, RN), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(15e6)),
    )(frames, origin, g, fmap_pad)


def _bucket_by_frame(jj, n_frames, n_slots):
    """Sort edge ids by target frame and pad each frame group to a multiple
    of EB. Returns (slot_edge [n_slots] with E = dummy, slot_of_edge [E],
    frame_of_block [n_slots/EB])."""
    E = jj.shape[0]
    order = jnp.argsort(jj, stable=True)
    jj_sorted = jj[order]
    counts = jnp.bincount(jj, length=n_frames)
    aligned = ((counts + EB - 1) // EB) * EB
    slot_starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                   jnp.cumsum(aligned)[:-1].astype(jnp.int32)])
    rank_starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                   jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    r = jnp.arange(E)
    slot_of_sorted = slot_starts[jj_sorted] + (r - rank_starts[jj_sorted])
    slot_edge = jnp.full((n_slots,), E, jnp.int32).at[slot_of_sorted].set(
        order.astype(jnp.int32))
    slot_of_edge = jnp.zeros((E,), jnp.int32).at[order].set(
        slot_of_sorted.astype(jnp.int32))
    frame_of_block = jnp.zeros((n_slots // EB,), jnp.int32).at[
        slot_of_sorted // EB].max(jj_sorted.astype(jnp.int32))
    return slot_edge, slot_of_edge, frame_of_block


def _pallas_corr_level(gmap_e, fmap, coords, jj, n_slots):
    """One pyramid level. gmap_e: [E+1, P16, C] (last row = dummy zeros);
    fmap: [F, H, W, C]; coords [E, P, P, 2] at this level's scale.

    Returns full correlation c_full [E, P, P, 8, 8] fp32 (pre-blend), with
    out-of-image window positions exactly zero (zero padding) and
    out-of-region pixels zeroed.
    """
    E = coords.shape[0]
    F, H, W, C = fmap.shape

    # pad by the window reach, plus whatever is needed so the padded map is
    # at least one region large (tiny pyramid levels)
    pad_h = max(PAD, RSH - (H + PAD))
    pad_w = max(PAD, RSW - (W + PAD))
    fmap_pad = jnp.pad(fmap, ((0, 0), (PAD, pad_h), (PAD, pad_w), (0, 0)))
    Hp = H + PAD + pad_h
    Wp = W + PAD + pad_w

    ystart = jnp.floor(coords[..., 1]).astype(jnp.int32) - 3 + PAD  # [E,P,P]
    xstart = jnp.floor(coords[..., 0]).astype(jnp.int32) - 3 + PAD
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
    in_region = ((rel_y >= 0) & (rel_y <= RSH - 8) &
                 (rel_x >= 0) & (rel_x <= RSW - 8) &
                 (ystart >= 0) & (xstart >= 0) &
                 (ystart <= Hp - 8) & (xstart <= Wp - 8))
    rel_y = jnp.clip(rel_y, 0, RSH - 8)
    rel_x = jnp.clip(rel_x, 0, RSW - 8)

    origin = jnp.stack([oy, ox], axis=-1)
    origin = jnp.concatenate([origin, jnp.zeros((1, 2), jnp.int32)], axis=0)

    slot_edge, slot_of_edge, frame_of_block = _bucket_by_frame(
        jj, F, n_slots)

    surf = _surfaces(fmap_pad.astype(jnp.bfloat16),
                     frame_of_block,
                     origin[slot_edge],
                     gmap_e[slot_edge],
                     n_slots)                          # [n_slots, P16, RN]

    surf = surf[slot_of_edge][:, :P2].reshape(E, P2, RSH, RSW)

    # extract per-pixel 8x8 windows with one-hot contractions (no gathers)
    iy = jnp.arange(RSH)
    ix = jnp.arange(RSW)
    ohy = (rel_y[:, :, None, None] + jnp.arange(8)[None, None, :, None]
           == iy[None, None, None, :]).astype(jnp.bfloat16)   # [E,9,8,RSH]
    ohx = (rel_x[:, :, None, None] + jnp.arange(8)[None, None, :, None]
           == ix[None, None, None, :]).astype(jnp.bfloat16)
    t1 = jnp.einsum("epij,epdi->epdj", surf, ohy,
                    preferred_element_type=jnp.float32)
    win = jnp.einsum("epdj,epxj->epdx", t1.astype(jnp.bfloat16), ohx,
                     preferred_element_type=jnp.float32)      # [E,9,dy,dx]
    win = win * in_region[:, :, None, None]
    return win.reshape(E, 3, 3, 8, 8)


def patch_corr_pyramid_pallas(gmap, pyramid, coords, kk, jj, radius=3,
                              valid=None, levels=(1, 4)):
    """Drop-in replacement for `ops.corr.patch_corr_pyramid` (radius 3).

    gmap: [Ek, C, P, P]; pyramid: per-level [F, H_l, W_l, C] channel-last;
    coords: [E, P, P, 2] at level-1 scale; kk/jj: [E] indices.
    Returns [E, L*(2R+1)^2*P*P] with the reference feature layout.
    """
    assert radius == 3, "kernel is specialized for the reference radius 3"
    E, Pp = coords.shape[0], coords.shape[1]
    C = gmap.shape[1]

    # patch features, channel-last, pixel dim padded to a sublane tile,
    # plus a dummy row for padded slots
    g = jnp.moveaxis(gmap[kk], 1, -1).reshape(E, P2, C)
    g = jnp.pad(g, ((0, 1), (0, P16 - P2), (0, 0))).astype(jnp.bfloat16)

    F = pyramid[0].shape[0]
    n_slots = ((E + EB - 1) // EB) * EB + F * EB

    outs = []
    for fmap, s in zip(pyramid, levels):
        c = coords.astype(jnp.float32) / s
        win = _pallas_corr_level(g, fmap.astype(jnp.bfloat16), c, jj,
                                 n_slots)              # [E,3,3,8,8]
        # bilinear blend of the four integer shifts -> 7x7
        fx = (c[..., 0] - jnp.floor(c[..., 0]))        # [E,P,P]
        fy = (c[..., 1] - jnp.floor(c[..., 1]))
        fx = fx[..., None, None]
        fy = fy[..., None, None]
        d = 7
        out = ((1 - fx) * (1 - fy) * win[..., :d, :d]
               + fx * (1 - fy) * win[..., :d, 1:]
               + (1 - fx) * fy * win[..., 1:, :d]
               + fx * fy * win[..., 1:, 1:])           # [E,P,P,dy,dx]
        if valid is not None:
            out = out * valid.astype(out.dtype)[:, None, None, None, None]
        # reference layout: (dx, dy, pi, pj)
        outs.append(jnp.transpose(out, (0, 4, 3, 1, 2)))
    return jnp.stack(outs, axis=-1).reshape(E, -1)
