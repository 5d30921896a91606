"""Dense per-pixel geometry ops (the DROID-backend equivalents).

TPU-native counterparts of the reference's bundled second engine
(`src/droid_kernels.cu`, exposed via `src/droid.cpp:237-250`) used by the
DROID evaluation path: dense analogues of the patch ops operating on full
disparity maps. Implemented as jitted jnp over pixel grids (the MXU/VPU
eat these shapes directly; no custom kernels needed at /8 resolution):

  iproj_dense      `iproj_kernel` (droid_kernels.cu:779)
  projmap          `projmap_kernel` (:427) — dense reprojection coords+valid
  frame_distance   `frame_distance_kernel` (:518) — mean-flow keyframe
                   distance with the translation-only blend
  depth_filter     `depth_filter_kernel` (:661) — multi-view consistency
  dense_ba         the dense Gauss-Newton (`droid_kernels.cu:176,1314-1436`)
                   expressed through the shared `ba.bundle_adjust` over a
                   regular pixel grid (one "patch" per stride-s pixel, with
                   the depth-sensor regularization term alpha)
  corr_volume /    the RAFT-style lookup family (`src/correlation_kernels.cu:
  corr_pyramid /   20-124` corr_index_forward): all-pairs feature correlation
  corr_index       volume, average-pooled pyramid, and per-pixel bilinear
                   window sampling — the one native kernel family that had
                   no TPU counterpart through round 2
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import lie


def _grid(ht, wd, dtype=jnp.float32):
    x = jnp.arange(wd, dtype=dtype)
    y = jnp.arange(ht, dtype=dtype)
    return jnp.meshgrid(x, y, indexing="xy")


def iproj_dense(disps, intrinsics):
    """Back-project disparity maps: [N, H, W] -> homogeneous [N, H, W, 4]."""
    n, ht, wd = disps.shape
    fx, fy, cx, cy = intrinsics
    x, y = _grid(ht, wd)
    X = jnp.broadcast_to((x - cx) / fx, disps.shape)
    Y = jnp.broadcast_to((y - cy) / fy, disps.shape)
    return jnp.stack([X, Y, jnp.ones_like(disps), disps], axis=-1)


def projmap(poses, disps, intrinsics, ii, jj):
    """Dense reprojection coords of frame ii pixels into frame jj.

    Returns (coords [E, H, W, 2], valid [E, H, W]).
    """
    X0 = iproj_dense(disps[ii] if disps.ndim == 3 else disps, intrinsics)
    Gij = lie.se3_mul(poses[jj], lie.se3_inv(poses[ii]))
    X1 = lie.se3_act4(Gij[:, None, None, :], X0)
    Z = X1[..., 2]
    fx, fy, cx, cy = intrinsics
    d = 1.0 / jnp.clip(Z, min=0.1)
    coords = jnp.stack([fx * X1[..., 0] * d + cx,
                        fy * X1[..., 1] * d + cy], axis=-1)
    return coords, (Z > 0.2).astype(jnp.float32)


def frame_distance(poses, disps, intrinsics, ii, jj, beta=0.3):
    """Mean-flow distance between frame pairs (keyframe decision metric).

    Blends full flow with rotation-suppressed (translation-only) flow by
    beta, as `frame_distance_kernel` does.
    """
    ht, wd = disps.shape[-2:]
    x, y = _grid(ht, wd)
    base = jnp.stack([jnp.broadcast_to(x, disps[ii].shape),
                      jnp.broadcast_to(y, disps[ii].shape)], axis=-1)
    coords, valid = projmap(poses, disps[ii], intrinsics, ii, jj)

    poses_t = poses.at[:, 3:7].set(
        jnp.zeros_like(poses[:, 3:7]).at[:, 3].set(1.0))
    coords_t, valid_t = projmap(poses_t, disps[ii], intrinsics, ii, jj)

    def mean_flow(c, v):
        f = jnp.linalg.norm(c - base, axis=-1)
        return jnp.sum(f * v, axis=(-2, -1)) / jnp.maximum(
            jnp.sum(v, axis=(-2, -1)), 1.0)

    return beta * mean_flow(coords, valid) + \
        (1 - beta) * mean_flow(coords_t, valid_t)


def depth_filter(poses, disps, intrinsics, ix, thresh=0.1):
    """Multi-view depth consistency count for frame ix against all others.

    A disparity at frame ix is supported by frame j when the reprojected
    inverse depth agrees within `thresh` (`depth_filter_kernel`).
    Returns [H, W] support counts.
    """
    n = disps.shape[0]
    X0 = iproj_dense(disps[ix][None], intrinsics)[0]      # [H, W, 4]

    def support(j):
        Gij = lie.se3_mul(poses[j], lie.se3_inv(poses[ix]))
        X1 = lie.se3_act4(Gij[None, None, :], X0)
        Z = X1[..., 2]
        d_proj = X1[..., 3] / jnp.clip(Z, min=0.1)        # inverse depth in j
        fx, fy, cx, cy = intrinsics
        u = fx * X1[..., 0] / jnp.clip(Z, min=0.1) + cx
        v = fy * X1[..., 1] / jnp.clip(Z, min=0.1) + cy
        ht, wd = disps.shape[-2:]
        ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, wd - 1)
        vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, ht - 1)
        d_obs = disps[j][vi, ui]
        ok = ((jnp.abs(d_obs - d_proj) < thresh) & (Z > 0.2) &
              (u >= 0) & (u < wd) & (v >= 0) & (v < ht) & (j != ix))
        return ok.astype(jnp.float32)

    return jnp.sum(jax.vmap(support)(jnp.arange(n)), axis=0)


def dense_ba(poses, disps, intrinsics, targets, weights, ii, jj,
             t0, t1, stride=8, iterations=2, lam=1e-4, alpha=0.0,
             disps_sens=None):
    """Dense bundle adjustment over a stride-s pixel grid.

    Expresses the DROID dense solve through the shared Schur-complement
    program: every stride-s pixel of every frame becomes a depth variable
    ("patch" of size 1x... 3x3 grid centered there), targets/weights are
    sampled from the dense flow fields. alpha adds the depth-sensor
    regularization of `droid_kernels.cu:1314-1436` by blending the solved
    disparities toward `disps_sens`.

    poses: [N,7]; disps: [N,H,W]; targets/weights: [E,H,W,2]; ii/jj: [E].
    Returns (poses, disps) updated.
    """
    from ..ba.gauss_newton import BAConfig, bundle_adjust

    n, ht, wd = disps.shape
    ys = jnp.arange(stride // 2, ht, stride)
    xs = jnp.arange(stride // 2, wd, stride)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    gy, gx = gy.reshape(-1), gx.reshape(-1)
    M = gy.shape[0]

    # build patch state: one 3x3 patch per grid pixel, per frame
    def frame_patches(f):
        d = disps[f][gy, gx]
        offs = jnp.arange(3) - 1
        px = gx[:, None, None] + offs[None, None, :]
        py = gy[:, None, None] + offs[None, :, None]
        pd = jnp.broadcast_to(d[:, None, None], (M, 3, 3))
        return jnp.stack([jnp.broadcast_to(px, (M, 3, 3)).astype(jnp.float32),
                          jnp.broadcast_to(py, (M, 3, 3)).astype(jnp.float32),
                          pd], axis=1)

    patches = jax.vmap(frame_patches)(jnp.arange(n)).reshape(n * M, 3, 3, 3)

    E = ii.shape[0]
    kk = (ii[:, None] * M + jnp.arange(M)[None, :]).reshape(-1)
    ii_e = jnp.repeat(ii, M)
    jj_e = jnp.repeat(jj, M)
    tgt = targets[:, gy, gx, :].reshape(E * M, 2)
    wgt = weights[:, gy, gx, :].reshape(E * M, 2)
    valid = jnp.ones((E * M,), bool)

    cfg = BAConfig(window=int(t1 - t0) if isinstance(t1 - t0, int) else 16,
                   patch_slots=n * M, iterations=iterations)
    poses, patches = bundle_adjust(
        poses, patches, intrinsics, tgt, wgt, lam, ii_e, jj_e, kk, valid,
        t0, t1, 0, cfg)

    d_new = patches.reshape(n, M, 3, 3, 3)[:, :, 2, 1, 1]
    disps_out = disps.at[:, gy, gx].set(d_new)
    if alpha > 0 and disps_sens is not None:
        disps_out = (1 - alpha) * disps_out + alpha * disps_sens
    return poses, disps_out


# ---------------------------------------------------------------------------
# RAFT-style correlation lookup (`src/correlation_kernels.cu:20-124`)
# ---------------------------------------------------------------------------

def corr_volume(fmap1, fmap2):
    """All-pairs correlation volume.

    fmap1: [N, h1, w1, C]; fmap2: [N, h2, w2, C] (channel-last); returns
    [N, h1, w1, h2, w2] = <f1, f2> / sqrt(C) — the volume the DROID
    CorrBlock materializes before pyramid pooling (one MXU matmul per
    pair; at /8 resolution the volume is a few tens of MB).
    """
    N, h1, w1, C = fmap1.shape
    h2, w2 = fmap2.shape[1], fmap2.shape[2]
    a = fmap1.reshape(N, h1 * w1, C)
    b = fmap2.reshape(N, h2 * w2, C)
    v = jnp.einsum("nic,njc->nij", a, b,
                   preferred_element_type=jnp.float32)
    return (v / jnp.sqrt(jnp.float32(C))).reshape(N, h1, w1, h2, w2)


def corr_pyramid(volume, num_levels=4):
    """Average-pool the TARGET dims by 2 per level (RAFT pyramid)."""
    N, h1, w1, h2, w2 = volume.shape
    out = [volume]
    v = volume
    for _ in range(num_levels - 1):
        h2, w2 = v.shape[3] // 2, v.shape[4] // 2
        v = v.reshape(N, h1, w1, h2, 2, w2, 2).mean(axis=(4, 6))
        out.append(v)
    return out


def corr_index(volume, coords, radius):
    """Bilinear (2r+1)x(2r+1) window sampling of each source pixel's
    correlation slice — exact semantics of `corr_index_forward_kernel`
    (`src/correlation_kernels.cu:20-70`), including zero padding outside
    the target image.

    volume: [N, h1, w1, h2, w2]; coords: [N, 2, h1, w1] as (x, y) in the
    target grid of THIS level. Returns [N, rd, rd, h1, w1] with
    out[n, i, j, y, x] = bilinear(volume[n, y, x] at
    (x0 - r + i, y0 - r + j)).
    """
    N, h1, w1, h2, w2 = volume.shape
    rd = 2 * radius + 1
    x0 = coords[:, 0]                                     # [N, h1, w1]
    y0 = coords[:, 1]
    xf = jnp.floor(x0)
    yf = jnp.floor(y0)
    dx = (x0 - xf)[..., None, None]                       # [N,h1,w1,1,1]
    dy = (y0 - yf)[..., None, None]

    offs = jnp.arange(rd + 1, dtype=jnp.int32) - radius
    xs = xf.astype(jnp.int32)[..., None, None] + offs[None, None, None,
                                                      None, :]
    ys = yf.astype(jnp.int32)[..., None, None] + offs[None, None, None, :,
                                                      None]
    xs = jnp.broadcast_to(xs, (N, h1, w1, rd + 1, rd + 1))
    ys = jnp.broadcast_to(ys, (N, h1, w1, rd + 1, rd + 1))
    inb = (xs >= 0) & (xs < w2) & (ys >= 0) & (ys < h2)
    flat = jnp.clip(ys, 0, h2 - 1) * w2 + jnp.clip(xs, 0, w2 - 1)

    vol = volume.reshape(N, h1, w1, h2 * w2)
    win = jnp.take_along_axis(
        vol, flat.reshape(N, h1, w1, -1), axis=3
    ).reshape(N, h1, w1, rd + 1, rd + 1)
    win = jnp.where(inb, win, 0.0)                        # [.., j(y), i(x)]

    out = ((1 - dx) * (1 - dy) * win[..., :rd, :rd]
           + dx * (1 - dy) * win[..., :rd, 1:]
           + (1 - dx) * dy * win[..., 1:, :rd]
           + dx * dy * win[..., 1:, 1:])                  # [N,h1,w1,j,i]
    return jnp.transpose(out, (0, 4, 3, 1, 2))            # [N, i, j, h1, w1]


def corr_lookup_pyramid(pyramid, coords, radius):
    """Stacked multi-level lookup (DROID `CorrBlock.__call__`): sample
    every level at coords / 2^l and concatenate the windows.

    Returns [N, L * rd * rd, h1, w1].
    """
    outs = []
    for lvl, vol in enumerate(pyramid):
        c = coords / (2.0 ** lvl)
        outs.append(corr_index(vol, c, radius))
    N, rd, _, h1, w1 = outs[0].shape
    return jnp.concatenate([o.reshape(N, -1, h1, w1) for o in outs], axis=1)
