"""Patch correlation lookup (the hot op of the update loop).

TPU-native equivalent of the reference's `cuda_corr` kernel
(`dpvo/altcorr/correlation_kernel.cu:83-136` forward + the host-side bilinear
blend at `correlation_kernel.cu:221-232`): for every edge e with patch
features g = gmap[kk[e]] and target feature map F = fmap[jj[e]], compute

    corr[e, p, dy, dx] = <g[:, p], F[:, floor(y_p)+dy-R, floor(x_p)+dx-R]>

over a (2R+2)x(2R+2) window, then bilinearly blend the four integer shifts
into a (2R+1)^2 correlation patch, and emit the feature vector in the exact
layout the pretrained update network expects (`dpvo/dpvo.py:326-333` /
`net.py:179-192`): per level [dx_off, dy_off, pi, pj], levels stacked last.

Two implementations:
  * `patch_corr` — batched XLA gather + einsum, chunked over edges with
    lax.map to bound the materialized window tensor. Correctness oracle and
    CPU fallback; fully jit-compatible with static shapes.
  * `ops.pallas.corr` (separate module) — fused Pallas TPU kernel keeping
    the target-frame feature tile in VMEM (no HBM materialization).
Use `corr_fn()` to select the best available implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _corr_level_chunk(gmap, fmap_flat, F, H, W, radius, args):
    """Correlation for one chunk of edges at one pyramid level.

    gmap:      [Ek, C, P, P] patch features (source side)
    fmap_flat: [F*H*W, C] target feature maps, channel-last flattened
    args: (coords [e, P, P, 2], kk [e], jj [e], valid [e])
    returns [e, 2R+1, 2R+1, P, P] blended correlation (dx, dy, pi, pj).
    """
    coords, kk, jj, valid = args
    e, P = coords.shape[0], coords.shape[1]
    D = 2 * radius + 2
    C = gmap.shape[1]

    x0 = jnp.floor(coords[..., 0])
    y0 = jnp.floor(coords[..., 1])
    dx = (coords[..., 0] - x0).astype(gmap.dtype)              # [e, P, P]
    dy = (coords[..., 1] - y0).astype(gmap.dtype)

    off = jnp.arange(D) - radius
    ys = y0.astype(jnp.int32)[..., None] + off                 # [e, P, P, D]
    xs = x0.astype(jnp.int32)[..., None] + off
    in_b = ((ys[..., :, None] >= 0) & (ys[..., :, None] < H) &
            (xs[..., None, :] >= 0) & (xs[..., None, :] < W))  # [e,P,P,D,D]
    ysc = jnp.clip(ys, 0, H - 1)
    xsc = jnp.clip(xs, 0, W - 1)

    base = (jj * (H * W))[:, None, None, None, None]
    flat = base + ysc[..., :, None] * W + xsc[..., None, :]    # [e,P,P,D,D]
    win = fmap_flat[flat.reshape(-1)].reshape(e, P, P, D, D, C)

    g = jnp.moveaxis(gmap[kk], 1, -1)                          # [e, P, P, C]
    c_full = jnp.einsum("eijc,eijklc->eijkl", g, win,
                        preferred_element_type=jnp.float32)
    c_full = jnp.where(in_b, c_full, 0.0)                      # [e,P,P,D,D]

    d = 2 * radius + 1
    dxe = dx[..., None, None]
    dye = dy[..., None, None]
    out = ((1 - dxe) * (1 - dye) * c_full[..., :d, :d]
           + dxe * (1 - dye) * c_full[..., :d, 1:]
           + (1 - dxe) * dye * c_full[..., 1:, :d]
           + dxe * dye * c_full[..., 1:, 1:])                  # [e,P,P,dy,dx]
    out = out * valid[:, None, None, None, None]
    # reference layout: (dx_off, dy_off, pi, pj)
    return jnp.transpose(out, (0, 4, 3, 1, 2))


def patch_corr_level(gmap, fmap, coords, kk, jj, radius=3, valid=None,
                     chunk=2048):
    """One-level correlation over all edges, chunked to bound memory.

    gmap:   [Ek, C, P, P]
    fmap:   [F, H, W, C] (channel-last target maps at this pyramid level)
    coords: [E, P, P, 2] reprojected patch pixel coords at this level's scale
    kk:     [E] row into gmap;  jj: [E] frame slot into fmap
    returns [E, 2R+1, 2R+1, P, P] float32
    """
    E = coords.shape[0]
    F, H, W, C = fmap.shape
    if valid is None:
        valid = jnp.ones((E,), dtype=fmap.dtype)
    else:
        valid = valid.astype(fmap.dtype)
    fmap_flat = fmap.reshape(F * H * W, C)

    fn = functools.partial(_corr_level_chunk, gmap, fmap_flat, F, H, W, radius)
    if E <= chunk:
        return fn((coords, kk, jj, valid))

    n_chunks = -(-E // chunk)
    pad = n_chunks * chunk - E
    coords_p = jnp.pad(coords, ((0, pad),) + ((0, 0),) * 3)
    kk_p = jnp.pad(kk, (0, pad))
    jj_p = jnp.pad(jj, (0, pad))
    valid_p = jnp.pad(valid, (0, pad))
    args = (coords_p.reshape(n_chunks, chunk, *coords.shape[1:]),
            kk_p.reshape(n_chunks, chunk),
            jj_p.reshape(n_chunks, chunk),
            valid_p.reshape(n_chunks, chunk))
    out = jax.lax.map(fn, args)
    return out.reshape(n_chunks * chunk, *out.shape[2:])[:E]


def patch_corr_pyramid(gmap, pyramid, coords, kk, jj, radius=3, valid=None,
                       levels=(1, 4), chunk=2048):
    """Multi-level correlation feature, reference-compatible flattening.

    pyramid: tuple of [F, H_l, W_l, C] maps (level scales in `levels`)
    coords:  [E, P, P, 2] at level-1 scale
    returns [E, L * (2R+1)^2 * P * P] with index order
            (dx_off, dy_off, pi, pj, level) — matches
            `torch.stack([corr1, corr2], -1).view(1, E, -1)` at
            `dpvo/dpvo.py:333`.
    """
    E, P = coords.shape[0], coords.shape[1]
    outs = []
    for fmap, s in zip(pyramid, levels):
        outs.append(patch_corr_level(gmap, fmap, coords / s, kk, jj,
                                     radius=radius, valid=valid, chunk=chunk))
    out = jnp.stack(outs, axis=-1)                 # [E, d, d, P, P, L]
    return out.reshape(E, -1)


def patch_corr_naive(gmap, fmap, coords, kk, jj, radius=3):
    """Tiny numpy-style loop oracle (test-only)."""
    import numpy as np
    gmap, fmap, coords = map(np.asarray, (gmap, fmap, coords))
    kk, jj = map(np.asarray, (kk, jj))
    E, P = coords.shape[0], coords.shape[1]
    F, H, W, C = fmap.shape
    D = 2 * radius + 2
    d = 2 * radius + 1
    out = np.zeros((E, d, d, P, P), np.float32)
    for e in range(E):
        for pi in range(P):
            for pj in range(P):
                x, y = coords[e, pi, pj]
                x0, y0 = int(np.floor(x)), int(np.floor(y))
                fx, fy = x - x0, y - y0
                full = np.zeros((D, D), np.float32)
                for a in range(D):
                    for b in range(D):
                        yy, xx = y0 + a - radius, x0 + b - radius
                        if 0 <= yy < H and 0 <= xx < W:
                            full[a, b] = np.dot(
                                gmap[kk[e], :, pi, pj].astype(np.float32),
                                fmap[jj[e], yy, xx].astype(np.float32))
                blend = ((1 - fx) * (1 - fy) * full[:d, :d]
                         + fx * (1 - fy) * full[:d, 1:]
                         + (1 - fx) * fy * full[1:, :d]
                         + fx * fy * full[1:, 1:])
                out[e, :, :, pi, pj] = blend.T     # (dx, dy)
    return out
