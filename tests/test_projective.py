"""Tests for projective ops: analytic Jacobians vs autodiff, invariances."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wild_video_3d_reconstruction_tpu.ops import lie, projective as pops


def make_scene(key, n_frames=5, n_patches=12, P=3):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    poses = lie.se3_exp(0.1 * jax.random.normal(k1, (n_frames, 6)))
    # patch centers in a 128x96 image at /1 scale, positive inverse depth
    xy = jax.random.uniform(k2, (n_patches, 2, 1, 1), minval=10.0, maxval=90.0)
    offs = jnp.stack(jnp.meshgrid(jnp.arange(P) - P // 2,
                                  jnp.arange(P) - P // 2, indexing="xy"), 0)
    xy = xy + offs[None].astype(jnp.float32)
    d = jax.random.uniform(k3, (n_patches, 1, 1, 1), minval=0.2, maxval=2.0)
    d = jnp.broadcast_to(d, (n_patches, 1, P, P))
    patches = jnp.concatenate([xy, d], axis=1)
    intr = jnp.tile(jnp.asarray([[80.0, 80.0, 64.0, 48.0]]), (n_frames, 1))
    ii = jax.random.randint(k4, (n_patches,), 0, n_frames)
    jj = (ii + 1) % n_frames
    kk = jnp.arange(n_patches)
    return poses, patches, intr, ii, jj, kk


def test_identity_transform_roundtrip():
    key = jax.random.PRNGKey(0)
    poses, patches, intr, ii, jj, kk = make_scene(key)
    coords = pops.transform(poses, patches, intr, ii, ii, kk)
    np.testing.assert_allclose(
        np.asarray(coords),
        np.moveaxis(np.asarray(patches[kk][:, :2]), 1, -1), atol=1e-3)


def test_jacobians_match_autodiff():
    key = jax.random.PRNGKey(1)
    poses, patches, intr, ii, jj, kk = make_scene(key)
    P = patches.shape[-1]

    coords, v, (Ji, Jj, Jz) = pops.transform(
        poses, patches, intr, ii, jj, kk, jacobian=True)

    def center(poses_):
        c = pops.transform(poses_, patches, intr, ii, jj, kk)
        return c[:, P // 2, P // 2, :]

    # autodiff wrt left-multiplicative perturbation of all poses
    def perturbed(xi):
        return center(lie.se3_mul(lie.se3_exp(xi), poses))

    J = jax.jacfwd(perturbed)(jnp.zeros((poses.shape[0], 6)))  # [E,2,N,6]
    E = len(kk)
    Jj_auto = J[jnp.arange(E), :, jj, :]
    Ji_auto = J[jnp.arange(E), :, ii, :]
    np.testing.assert_allclose(np.asarray(Jj), np.asarray(Jj_auto),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(Ji), np.asarray(Ji_auto),
                               atol=1e-3, rtol=1e-3)

    # autodiff wrt inverse depth of the patch center
    def depth_center(dz):
        p = patches.at[:, 2].add(dz[:, None, None])
        c = pops.transform(poses, p, intr, ii, jj, kk)
        return c[:, P // 2, P // 2, :]

    Jz_auto = jax.jacfwd(depth_center)(jnp.zeros((patches.shape[0],)))
    Jz_auto = Jz_auto[jnp.arange(E), :, kk]
    np.testing.assert_allclose(np.asarray(Jz[..., 0]), np.asarray(Jz_auto),
                               atol=1e-3, rtol=1e-3)


def test_point_cloud_reprojects():
    # lifting to world and transforming back into the source frame must
    # reproduce the original pixels
    key = jax.random.PRNGKey(2)
    poses, patches, intr, ii, jj, kk = make_scene(key)
    pts = pops.point_cloud(poses, patches, intr, ii)
    # re-project into frame ii: X_cam = pose_ii * X_world
    Xc = lie.se3_act4(poses[ii][:, None, None], pts)
    pix = pops.proj(Xc, intr[ii])
    np.testing.assert_allclose(
        np.asarray(pix), np.moveaxis(np.asarray(patches[:, :2]), 1, -1),
        atol=1e-3)


def test_flow_mag_zero_for_identity():
    key = jax.random.PRNGKey(3)
    poses, patches, intr, ii, jj, kk = make_scene(key)
    ident = jnp.tile(lie.se3_identity((1,)), (poses.shape[0], 1))
    fm = pops.flow_mag(ident, patches, intr, ii, jj, kk)
    np.testing.assert_allclose(np.asarray(fm), 0.0, atol=1e-3)
    fm2 = pops.flow_mag(poses, patches, intr, ii, jj, kk)
    assert float(jnp.mean(fm2)) > 0.01


def test_valid_mask():
    key = jax.random.PRNGKey(4)
    poses, patches, intr, ii, jj, kk = make_scene(key)
    _, valid = pops.transform(poses, patches, intr, ii, jj, kk, valid=True)
    assert valid.shape == patches[:, 0].shape
    assert np.all((np.asarray(valid) == 0) | (np.asarray(valid) == 1))
