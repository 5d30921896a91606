"""VONet: patch extraction + recurrent update (the flagship model).

Functional equivalent of the reference `VONet` (`dpvo/net.py:195-203`):
P=3 patches, RES=4, DIM=384, 128-channel matching features, with the
Patchifier (`net.py:96-176`) split into a jit-friendly pipeline:

  encode_frame   - both stride-4 encoders on one frame (MXU convs, bf16)
  select_patches - random / gradient-biased / mask-constrained centers
  gather_patches - imap/gmap/color/(x,y,d) patch gathers

The update operator lives in `models.update`. Weights interoperate with the
published torch checkpoint via `models.convert`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.patchify import avg_pool2d, patchify
from .extractor import basic_encoder4, init_basic_encoder4
from .update import init_update, update_forward  # noqa: F401  (re-export)

P = 3
RES = 4
DIM = 384
FDIM = 128


class FrameFeatures(NamedTuple):
    fmap: jnp.ndarray    # [H/4, W/4, 128]   matching features (already /4)
    imap: jnp.ndarray    # [H/4, W/4, 384]   context features (already /4)


def init_vonet(key, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "fnet": init_basic_encoder4(k1, FDIM, dtype),
        "inet": init_basic_encoder4(k2, DIM, dtype),
        "update": init_update(k3, P, dtype),
    }


def normalize_image(image):
    """uint8 [H, W, 3] (BGR, as decoded) -> float in [-0.5, 1.5].

    Matches `images = 2 * (images / 255) - 0.5` (`dpvo/net.py:119`).
    """
    return 2.0 * (image.astype(jnp.float32) / 255.0) - 0.5


def encode_frame(params, image, compute_dtype=jnp.bfloat16):
    """Run both encoders on one frame.

    image: [H, W, 3] uint8. Returns FrameFeatures at 1/4 resolution, scaled
    by 1/4 as the reference does (`dpvo/net.py:121-122`).
    """
    x = normalize_image(image)[None].astype(compute_dtype)
    fmap = basic_encoder4(params["fnet"], x, "instance") / 4.0
    imap = basic_encoder4(params["inet"], x, "none") / 4.0
    return FrameFeatures(fmap[0], imap[0])


def image_gradient_map(image):
    """Pooled luminance-gradient magnitude for biased patch selection.

    image: [H, W, 3] uint8; returns [(H-1)//4, (W-1)//4]. Mirrors
    `Patchifier.__image_gradient` (`dpvo/net.py:103-109`) — the normalized
    image is mapped back to a 0..382 luminance sum before differencing.
    """
    norm = normalize_image(image)
    gray = ((norm + 0.5) * (255.0 / 2)).sum(axis=-1)
    dx = gray[:-1, 1:] - gray[:-1, :-1]
    dy = gray[1:, :-1] - gray[:-1, :-1]
    g = jnp.sqrt(dx * dx + dy * dy)
    return avg_pool2d(g[..., None], 4)[..., 0]


def keypoint_response_map(image):
    """Shi-Tomasi (min-eigenvalue) corner response on the 1/4 grid with
    3x3 non-max suppression — the weight-free stand-in for the reference's
    optional SuperPoint patch extractor (`dpvo/net.py:112-117`, which calls
    an external `sp_extractor` and divides keypoints by 4).

    image: [H, W, 3] uint8; returns [(H-1)//4, (W-1)//4] response, zero at
    non-maxima.
    """
    gray = image.astype(jnp.float32) @ jnp.asarray([0.114, 0.587, 0.299])
    gx = jnp.zeros_like(gray).at[:, 1:-1].set(
        0.5 * (gray[:, 2:] - gray[:, :-2]))
    gy = jnp.zeros_like(gray).at[1:-1, :].set(
        0.5 * (gray[2:, :] - gray[:-2, :]))
    win = (5, 5)
    sxx = jax.lax.reduce_window(gx * gx, 0.0, jax.lax.add, win, (1, 1),
                                "SAME")
    syy = jax.lax.reduce_window(gy * gy, 0.0, jax.lax.add, win, (1, 1),
                                "SAME")
    sxy = jax.lax.reduce_window(gx * gy, 0.0, jax.lax.add, win, (1, 1),
                                "SAME")
    tr = sxx + syy
    det = sxx * syy - sxy * sxy
    resp = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
    resp = avg_pool2d(resp[:-1, :-1, None], 4)[..., 0]
    pooled = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max, (3, 3),
                                   (1, 1), "SAME")
    return jnp.where(resp >= pooled, resp, 0.0)


def select_patches(key, M, h, w, gradient_map=None, mask=None,
                   oversample=3, keypoint_map=None):
    """Choose M patch centers on the 1/4-resolution grid.

    Reproduces the four policies of `Patchifier.forward`
    (`dpvo/net.py:112-152`) with static shapes:
      * random:        uniform ints in [1, w-1) x [1, h-1)
      * gradient bias: sample 3M, keep the top-M by pooled gradient
      * mask:          sample `oversample`*M, prefer centers whose full-res
                       pixel is unmasked (random among valid)
      * keypoints:     top-M NMS'd corner responses (`keypoint_map`), the
                       SuperPoint-equivalent path; weak slots fall back to
                       random centers
    Returns float coords [M, 2] (x, y).
    """
    kx, ky, kr = jax.random.split(key, 3)
    if keypoint_map is not None:
        gh, gw = keypoint_map.shape
        score, idx = jax.lax.top_k(keypoint_map.reshape(-1), M)
        cy = jnp.clip(idx // gw, 1, h - 2)
        cx = jnp.clip(idx % gw, 1, w - 2)
        rx = jax.random.randint(kx, (M,), 1, w - 1)
        ry = jax.random.randint(ky, (M,), 1, h - 1)
        x = jnp.where(score > 0, cx, rx)
        y = jnp.where(score > 0, cy, ry)
    elif gradient_map is not None:
        n = oversample * M
        x = jax.random.randint(kx, (n,), 1, w - 1)
        y = jax.random.randint(ky, (n,), 1, h - 1)
        gh, gw = gradient_map.shape
        score = gradient_map[jnp.clip(y, 0, gh - 1), jnp.clip(x, 0, gw - 1)]
        top = jnp.argsort(score)[-M:]
        x, y = x[top], y[top]
    elif mask is not None:
        n = 4 * M
        x = jax.random.randint(kx, (n,), 1, w - 1)
        y = jax.random.randint(ky, (n,), 1, h - 1)
        mh, mw = mask.shape
        ok = mask[jnp.clip(RES * y, 0, mh - 1), jnp.clip(RES * x, 0, mw - 1)]
        score = ok.astype(jnp.float32) + 1e-3 * jax.random.uniform(kr, (n,))
        top = jnp.argsort(score)[-M:]
        x, y = x[top], y[top]
    else:
        x = jax.random.randint(kx, (M,), 1, w - 1)
        y = jax.random.randint(ky, (M,), 1, h - 1)
    return jnp.stack([x, y], axis=-1).astype(jnp.float32)


def gather_patches(feats: FrameFeatures, image, coords, disp=None):
    """Gather per-patch tensors at the selected centers.

    Returns (imap [M, 384], gmap [M, 128, P, P], clr [M, 3] RGB 0..255,
    patches [M, 3, P, P] of (x, y, inverse-depth)). Mirrors
    `dpvo/net.py:158-168` (+ color at `net.py:162`, `dpvo/dpvo.py:796`).

    disp: optional [H/4, W/4] inverse-depth map used to initialize the patch
    depth channel (training path); defaults to ones.
    """
    M = coords.shape[0]
    imap_p = patchify(feats.imap.astype(jnp.float32), coords, 0)[:, :, 0, 0]
    gmap_p = patchify(feats.fmap.astype(jnp.float32), coords, P // 2)

    norm = normalize_image(image)
    clr = patchify(norm, RES * (coords + 0.5), 0)[:, :, 0, 0]
    clr = (clr[:, [2, 1, 0]] + 0.5) * (255.0 / 2)    # BGR -> RGB, de-normalize

    offs = jnp.arange(P, dtype=jnp.float32) - P // 2
    px = coords[:, None, None, 0] + offs[None, None, :]
    py = coords[:, None, None, 1] + offs[None, :, None]
    px = jnp.broadcast_to(px, (M, P, P))
    py = jnp.broadcast_to(py, (M, P, P))
    if disp is None:
        pd = jnp.ones((M, P, P), jnp.float32)
    else:
        grid = jnp.stack([px, py], axis=-1).reshape(M * P * P, 2)
        pd = patchify(disp[..., None].astype(jnp.float32), grid, 0)
        pd = pd[:, 0, 0, 0].reshape(M, P, P)
    patches = jnp.stack([px, py, pd], axis=1)
    return imap_p.astype(feats.imap.dtype), gmap_p.astype(feats.fmap.dtype), \
        clr, patches
