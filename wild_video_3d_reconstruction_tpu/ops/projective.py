"""Projective geometry over patch graphs (pure JAX, jit-friendly).

TPU-native equivalent of the reference's `dpvo/projective_ops.py` (iproj /
proj / transform with analytic Jacobians / point_cloud / flow_mag). Same
conventions:

  * poses are world-to-camera SE3 (`patchgraph.py:30`),
  * patches are [..., 3, P, P] grids of (x, y, inverse-depth) at 1/RES
    resolution (`dpvo/patchgraph.py:31`),
  * back-projection uses homogeneous (x_n, y_n, 1, d) coordinates so that
    points at infinity (d == 0) are well behaved (`projective_ops.py:19-29`),
  * the analytic Jacobians match `projective_ops.py:71-99` / the fused forms
    in `fastba/ba_cuda.cu:285-335` (left-multiplicative pose perturbation,
    i.e. pose <- exp(xi) * pose).

All functions take flat state arrays plus int32 edge index vectors (ii =
source frame, jj = target frame, kk = patch id) and vectorize over the edge
axis; shapes are static so the whole thing stays inside one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import lie

MIN_DEPTH = 0.2


def iproj(patches, intrinsics):
    """Back-project patch pixels to homogeneous points.

    patches:    [E, 3, P, P] (x, y, inverse depth)
    intrinsics: [E, 4] (fx, fy, cx, cy)
    returns X:  [E, P, P, 4] = (x_n, y_n, 1, d)
    """
    x, y, d = patches[:, 0], patches[:, 1], patches[:, 2]
    fx, fy, cx, cy = [intrinsics[:, i, None, None] for i in range(4)]
    xn = (x - cx) / fx
    yn = (y - cy) / fy
    return jnp.stack([xn, yn, jnp.ones_like(d), d], axis=-1)


def proj(X, intrinsics, depth=False):
    """Project homogeneous points to pixels.

    X:          [E, P, P, 4]
    intrinsics: [E, 4]
    returns:    [E, P, P, 2] (or 3 with inverse depth when depth=True)
    """
    Z = X[..., 2]
    fx, fy, cx, cy = [intrinsics[:, i, None, None] for i in range(4)]
    d = 1.0 / jnp.clip(Z, min=0.1)
    px = fx * (d * X[..., 0]) + cx
    py = fy * (d * X[..., 1]) + cy
    if depth:
        return jnp.stack([px, py, d], axis=-1)
    return jnp.stack([px, py], axis=-1)


def relative_poses(poses, ii, jj):
    """G_ij = pose_j * pose_i^-1 mapping frame-i camera coords to frame-j."""
    Gi = poses[ii]
    Gj = poses[jj]
    return lie.se3_mul(Gj, lie.se3_inv(Gi))


def transform(poses, patches, intrinsics, ii, jj, kk,
              depth=False, valid=False, jacobian=False, tonly=False):
    """Reproject patch kk from frame ii into frame jj.

    poses:      [N, 7] world-to-camera SE3
    patches:    [Nk, 3, P, P]
    intrinsics: [N, 4]
    ii, jj, kk: [E] int32

    Mirrors `projective_ops.transform` (`dpvo/projective_ops.py:53-104`),
    including the analytic center-pixel Jacobians (Ji, Jj, Jz) when
    jacobian=True.
    """
    X0 = iproj(patches[kk], intrinsics[ii])            # [E, P, P, 4]
    Gij = relative_poses(poses, ii, jj)                # [E, 7]

    if tonly:
        ident_q = jnp.zeros_like(Gij[:, 3:7]).at[:, 3].set(1.0)
        Gij = jnp.concatenate([Gij[:, :3], ident_q], axis=-1)

    X1 = lie.se3_act4(Gij[:, None, None, :], X0)       # [E, P, P, 4]
    x1 = proj(X1, intrinsics[jj], depth=depth)

    if jacobian:
        P = X1.shape[1]
        Xc = X1[:, P // 2, P // 2, :]                  # [E, 4] center pixel
        X, Y, Z, H = Xc[:, 0], Xc[:, 1], Xc[:, 2], Xc[:, 3]
        o = jnp.zeros_like(H)

        fx, fy = intrinsics[jj, 0], intrinsics[jj, 1]
        d = jnp.where(jnp.abs(Z) > MIN_DEPTH, 1.0 / jnp.where(
            jnp.abs(Z) > MIN_DEPTH, Z, 1.0), 0.0)

        # d(X1) / d(xi_j): action generator columns (tau | phi)
        Ja = jnp.stack([
            H, o, o, o, Z, -Y,
            o, H, o, -Z, o, X,
            o, o, H, Y, -X, o,
            o, o, o, o, o, o,
        ], axis=-1).reshape(-1, 4, 6)

        # d(pix) / d(X1) at the center
        Jp = jnp.stack([
            fx * d, o, -fx * X * d * d, o,
            o, fy * d, -fy * Y * d * d, o,
        ], axis=-1).reshape(-1, 2, 4)

        Jj = Jp @ Ja                                   # [E, 2, 6]
        Ji = -lie.se3_adjT(Gij[:, None, :], Jj)        # [E, 2, 6]

        # d(pix) / d(inverse depth): X1 column for the homogeneous weight
        tcol = jnp.concatenate([Gij[:, :3], jnp.ones_like(H)[:, None]], -1)
        Jz = Jp @ tcol[..., None]                      # [E, 2, 1]

        return x1, (Z > MIN_DEPTH).astype(x1.dtype), (Ji, Jj, Jz)

    if valid:
        return x1, (X1[..., 2] > MIN_DEPTH).astype(x1.dtype)
    return x1


def point_cloud(poses, patches, intrinsics, ix):
    """Lift patches to homogeneous world points (camera-to-world transform).

    Mirrors `projective_ops.point_cloud` (`dpvo/projective_ops.py:106-108`).
    Returns [Nk, P, P, 4]; divide xyz by the 4th (inverse-depth) component
    to obtain metric points.
    """
    X0 = iproj(patches, intrinsics[ix])
    Ginv = lie.se3_inv(poses[ix])
    return lie.se3_act4(Ginv[:, None, None, :], X0)


def flow_mag(poses, patches, intrinsics, ii, jj, kk, beta=0.3):
    """Blended full / translation-only flow magnitude between frames.

    Used for keyframe decisions; mirrors `projective_ops.flow_mag`
    (`dpvo/projective_ops.py:111-121`). Returns [E, P, P].
    """
    coords0 = transform(poses, patches, intrinsics, ii, ii, kk)
    coords1 = transform(poses, patches, intrinsics, ii, jj, kk)
    coords2 = transform(poses, patches, intrinsics, ii, jj, kk, tonly=True)
    flow1 = jnp.linalg.norm(coords1 - coords0, axis=-1)
    flow2 = jnp.linalg.norm(coords2 - coords0, axis=-1)
    return beta * flow1 + (1.0 - beta) * flow2


def coords_grid_with_index(d):
    """Pixel coordinate grid stacked with inverse-depth channel.

    d: [N, H, W] -> [N, 3, H, W] with channels (x, y, d). Equivalent of
    `utils.coords_grid_with_index` (`dpvo/utils.py:41-56`) without the batch
    dim.
    """
    n, h, w = d.shape
    x = jnp.arange(w, dtype=d.dtype)
    y = jnp.arange(h, dtype=d.dtype)
    xg = jnp.broadcast_to(x[None, None, :], (n, h, w))
    yg = jnp.broadcast_to(y[None, :, None], (n, h, w))
    return jnp.stack([xg, yg, d], axis=1)
