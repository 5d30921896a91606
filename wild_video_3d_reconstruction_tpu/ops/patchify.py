"""Patch gather ops (bilinear patch extraction from feature maps).

TPU-native equivalent of the reference's `altcorr.patchify` CUDA kernel
(`dpvo/altcorr/correlation_kernel.cu:17-47` + the bilinear blend in
`correlation.py:51-67`): gather a (2R+2)x(2R+2) neighborhood at floor(coord)
and blend the four integer shifts bilinearly, yielding (2R+1)^2 patches.

Feature maps are channel-last ([H, W, C]) — the natural TPU layout (C maps to
VMEM lanes). Runs once per frame over M patch centers; a plain XLA gather is
plenty (the per-update hot path is `ops.corr`, not this).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def patchify(fmap, coords, radius):
    """Extract bilinear patches.

    fmap:   [H, W, C] feature map
    coords: [M, 2] float (x, y) patch centers
    radius: static int R; output patches are (2R+1) x (2R+1)

    returns [M, C, 2R+1, 2R+1] (channel-first patches, matching the
    reference's gmap/imap layouts).
    """
    H, W, C = fmap.shape
    M = coords.shape[0]
    D = 2 * radius + 2

    x0 = jnp.floor(coords[:, 0])
    y0 = jnp.floor(coords[:, 1])
    dx = (coords[:, 0] - x0)[:, None, None, None]
    dy = (coords[:, 1] - y0)[:, None, None, None]

    off = jnp.arange(D) - radius
    ys = y0[:, None].astype(jnp.int32) + off[None, :]          # [M, D]
    xs = x0[:, None].astype(jnp.int32) + off[None, :]          # [M, D]
    in_y = (ys >= 0) & (ys < H)
    in_x = (xs >= 0) & (xs < W)
    ysc = jnp.clip(ys, 0, H - 1)
    xsc = jnp.clip(xs, 0, W - 1)

    grid = fmap[ysc[:, :, None], xsc[:, None, :]]              # [M, D, D, C]
    mask = (in_y[:, :, None] & in_x[:, None, :])[..., None]
    grid = jnp.where(mask, grid, 0.0)

    d = 2 * radius + 1
    x00 = (1 - dy) * (1 - dx) * grid[:, :d, :d]
    x01 = (1 - dy) * dx * grid[:, :d, 1:]
    x10 = dy * (1 - dx) * grid[:, 1:, :d]
    x11 = dy * dx * grid[:, 1:, 1:]
    out = x00 + x01 + x10 + x11                                # [M, d, d, C]
    return jnp.moveaxis(out, -1, 1)                            # [M, C, d, d]


def avg_pool2d(x, k):
    """k x k average pooling with stride k on [H, W, C] (or [N, H, W, C])."""
    if k == 1:
        return x
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    x = x[:, :h - h % k, :w - w % k]
    x = x.reshape(n, h // k, k, w // k, k, c).mean(axis=(2, 4))
    return x[0] if squeeze else x
