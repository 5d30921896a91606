"""Keypoint detection, description and matching for loop closure.

The reference uses pretrained DISK + LightGlue via kornia
(`dpvo/loop_closure/long_term.py:45-63`). The TPU rebuild replaces them
with self-contained, jit-compiled equivalents (no external pretrained
matcher dependency):

  detect    Shi-Tomasi corner response (structure-tensor min eigenvalue)
            with 2D max-pool NMS and static top-K selection — pure jnp,
            MXU/VPU friendly.
  describe  L2-normalized bilinear samples of the VO matching-feature map
            (fnet, 128-d) at keypoint locations — reusing the SLAM
            network's descriptors keeps the whole pipeline weight-
            compatible with the published checkpoint.
  match     mutual-nearest-neighbour on the descriptor similarity matrix
            (one MXU matmul) with a ratio test — the classical robust
            matcher; LightGlue-style context attention can substitute
            later without changing call sites.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.patchify import patchify


def _grayscale(image):
    return jnp.asarray(image, jnp.float32).mean(axis=-1)


def _box_filter(x, k):
    """Separable box filter on [H, W]."""
    pad = k // 2
    xpad = jnp.pad(x, ((pad, pad), (0, 0)), mode="edge")
    xv = sum(xpad[i:i + x.shape[0]] for i in range(k)) / k
    xpad = jnp.pad(xv, ((0, 0), (pad, pad)), mode="edge")
    return sum(xpad[:, i:i + x.shape[1]] for i in range(k)) / k


@functools.partial(jax.jit, static_argnames=("num_keypoints", "nms_radius"))
def detect(image, num_keypoints=1024, nms_radius=4):
    """Shi-Tomasi corners. image: [H, W, 3] uint8.

    Returns (xy [K, 2] float, score [K]) at full resolution; weak/padded
    slots carry score 0.
    """
    g = _grayscale(image)
    gx = jnp.zeros_like(g).at[:, 1:-1].set(0.5 * (g[:, 2:] - g[:, :-2]))
    gy = jnp.zeros_like(g).at[1:-1, :].set(0.5 * (g[2:, :] - g[:-2, :]))
    Ixx = _box_filter(gx * gx, 5)
    Iyy = _box_filter(gy * gy, 5)
    Ixy = _box_filter(gx * gy, 5)
    # min eigenvalue of the structure tensor
    tr = Ixx + Iyy
    det = Ixx * Iyy - Ixy * Ixy
    resp = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))

    # NMS: keep local maxima of a (2r+1)^2 window
    k = 2 * nms_radius + 1
    pooled = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max,
                                   (k, k), (1, 1), "SAME")
    resp = jnp.where((resp >= pooled) & (resp > 1e-3), resp, 0.0)
    # suppress borders
    H, W = resp.shape
    border = 8
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    resp = jnp.where((yy >= border) & (yy < H - border) &
                     (xx >= border) & (xx < W - border), resp, 0.0)

    flat = resp.reshape(-1)
    score, idx = jax.lax.top_k(flat, num_keypoints)
    xi = (idx % W).astype(jnp.int32)
    yi = (idx // W).astype(jnp.int32)

    # sub-pixel refinement: 1-D quadratic fit through the unsuppressed
    # response along each axis (the reference's DISK detector is
    # sub-pixel; integer corners alone cost ~0.3 px RMS per observation,
    # visible in the loop-closure triangulation residuals). NMS zeroes
    # neighbours, so sample the smoothed pre-NMS response.
    raw = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))

    def _peak_offset(m, p, c):
        denom = m - 2.0 * c + p
        off = jnp.where(jnp.abs(denom) > 1e-9,
                        0.5 * (m - p) / denom, 0.0)
        return jnp.clip(off, -0.5, 0.5)

    c = raw[yi, xi]
    dx = _peak_offset(raw[yi, jnp.maximum(xi - 1, 0)],
                      raw[yi, jnp.minimum(xi + 1, W - 1)], c)
    dy = _peak_offset(raw[jnp.maximum(yi - 1, 0), xi],
                      raw[jnp.minimum(yi + 1, H - 1), xi], c)
    xy = jnp.stack([xi.astype(jnp.float32) + dx,
                    yi.astype(jnp.float32) + dy], axis=-1)
    return xy, score


def describe(fmap, xy, scale=4.0):
    """Sample L2-normalized descriptors from the /4 feature map.

    fmap: [H/4, W/4, C]; xy: [K, 2] full-res coords.
    """
    desc = patchify(fmap.astype(jnp.float32), xy / scale, 0)[:, :, 0, 0]
    return desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)


@functools.partial(jax.jit, static_argnames=("ratio",))
def match(desc0, desc1, valid0, valid1, ratio=0.95):
    """Mutual-NN matching with ratio test.

    Returns (idx0 [K], idx1 [K], ok [K]) — up to K=min(K0,K1) pairs; ok
    marks accepted matches.
    """
    sim = jnp.dot(desc0, desc1.T, preferred_element_type=jnp.float32)
    sim = jnp.where(valid0[:, None] & valid1[None, :], sim, -2.0)

    best1 = jnp.argmax(sim, axis=1)                     # K0 -> best in 1
    best0 = jnp.argmax(sim, axis=0)                     # K1 -> best in 0
    k0 = jnp.arange(sim.shape[0])
    mutual = best0[best1] == k0

    top2 = jax.lax.top_k(sim, 2)[0]                     # [K0, 2]
    pass_ratio = top2[:, 1] < ratio * top2[:, 0]
    strong = top2[:, 0] > 0.0

    ok = mutual & pass_ratio & strong & valid0
    return k0, best1, ok
