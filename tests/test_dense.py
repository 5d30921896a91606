"""Dense (DROID-style) ops: projection consistency and dense BA recovery."""

import jax
import jax.numpy as jnp
import numpy as np

from wild_video_3d_reconstruction_tpu.ops import dense, lie

INTR = jnp.asarray([60.0, 60.0, 32.0, 24.0])


def scene(key, n=4, ht=48, wd=64):
    xi = 0.05 * jax.random.normal(key, (n, 6))
    poses = [lie.se3_identity(())]
    for t in range(1, n):
        poses.append(lie.se3_mul(lie.se3_exp(xi[t]), poses[-1]))
    poses = jnp.stack(poses)
    disps = jax.random.uniform(jax.random.fold_in(key, 1), (n, ht, wd),
                               minval=0.3, maxval=1.0)
    return poses, disps


def test_projmap_identity():
    poses, disps = scene(jax.random.PRNGKey(0))
    ii = jnp.asarray([0, 1])
    coords, valid = dense.projmap(poses, disps[ii], INTR, ii, ii)
    x, y = np.meshgrid(np.arange(64), np.arange(48), indexing="xy")
    np.testing.assert_allclose(np.asarray(coords[0, ..., 0]), x, atol=1e-3)
    np.testing.assert_allclose(np.asarray(coords[1, ..., 1]), y, atol=1e-3)
    assert np.all(np.asarray(valid) == 1)


def test_frame_distance_monotone():
    poses, disps = scene(jax.random.PRNGKey(1))
    ii = jnp.asarray([0, 0])
    jj = jnp.asarray([1, 3])
    d = np.asarray(dense.frame_distance(poses, disps, INTR, ii, jj))
    assert d[0] >= 0
    zero = np.asarray(dense.frame_distance(poses, disps, INTR,
                                           jnp.asarray([2]),
                                           jnp.asarray([2])))
    assert zero[0] < 1e-3


def test_depth_filter_consistent_scene():
    # consistent multi-view depths: a fronto-parallel plane at depth 2
    key = jax.random.PRNGKey(2)
    n, ht, wd = 4, 48, 64
    xi = jnp.zeros((n, 6)).at[:, 0].set(0.02 * jnp.arange(n))  # x-translation
    poses = lie.se3_exp(xi)
    # true geometry: plane z=2 -> disparity 0.5 everywhere for every cam
    disps = jnp.full((n, ht, wd), 0.5)
    support = np.asarray(dense.depth_filter(poses, disps, INTR, 1,
                                            thresh=0.05))
    assert support.mean() > 2.0     # supported by most other frames

    # corrupt the queried frame -> little support
    disps_bad = disps.at[1].set(1.5)
    support2 = np.asarray(dense.depth_filter(poses, disps_bad, INTR, 1,
                                             thresh=0.05))
    assert support2.mean() < 0.5


def test_dense_ba_reduces_flow_residual():
    key = jax.random.PRNGKey(3)
    poses, disps = scene(key)
    n = poses.shape[0]
    ii = jnp.asarray([0, 1, 2, 1, 2, 3])
    jj = jnp.asarray([1, 2, 3, 0, 1, 2])
    targets, valid = dense.projmap(poses, disps[ii], INTR, ii, jj)
    weights = jnp.ones_like(targets) * valid[..., None]

    noise = 0.01 * jax.random.normal(jax.random.fold_in(key, 5), (n, 6))
    noise = noise.at[0].set(0.0)
    poses0 = lie.se3_mul(lie.se3_exp(noise), poses)

    def resid(p, d):
        c, v = dense.projmap(p, d[ii], INTR, ii, jj)
        return float(jnp.sum(jnp.linalg.norm(c - targets, axis=-1) * v)
                     / jnp.sum(v))

    r0 = resid(poses0, disps)
    poses1, disps1 = dense.dense_ba(poses0, disps, INTR, targets, weights,
                                    ii, jj, 1, n, stride=8, iterations=4)
    r1 = resid(poses1, disps1)
    assert r1 < 0.5 * r0, (r0, r1)
