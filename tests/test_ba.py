"""Bundle adjustment: synthetic recovery tests.

Build a known scene (random poses + patches with known inverse depths),
project ground-truth targets, perturb the state, and check that the solver
drives it back — this exercises the entire geometric core end-to-end without
needing network weights (the pattern SURVEY.md section 4 prescribes).
"""

import jax
import jax.numpy as jnp
import numpy as np

from wild_video_3d_reconstruction_tpu.ba import BAConfig, bundle_adjust
from wild_video_3d_reconstruction_tpu.ops import lie
from wild_video_3d_reconstruction_tpu.ops import projective as pops

INTR = jnp.asarray([60.0, 60.0, 64.0, 48.0])


def build_scene(key, n_frames=6, patches_per_frame=24, P=3):
    """Random smooth trajectory looking at a fronto-parallel point cloud."""
    ks = jax.random.split(key, 5)
    # small random motion chain
    xi = 0.05 * jax.random.normal(ks[0], (n_frames, 6))
    poses = [lie.se3_identity(())]
    for t in range(1, n_frames):
        poses.append(lie.se3_mul(lie.se3_exp(xi[t]), poses[-1]))
    poses = jnp.stack(poses)

    M = patches_per_frame
    Nk = n_frames * M
    xy = jax.random.uniform(ks[1], (Nk, 2, 1, 1), minval=20.0, maxval=100.0)
    offs = jnp.stack(jnp.meshgrid(jnp.arange(P) - 1, jnp.arange(P) - 1,
                                  indexing="xy"), 0).astype(jnp.float32)
    xy = xy + offs[None]
    d = jax.random.uniform(ks[2], (Nk, 1, 1, 1), minval=0.25, maxval=1.0)
    patches = jnp.concatenate([xy, jnp.broadcast_to(d, (Nk, 1, P, P))], 1)

    # edges: each patch observed in all frames within +-2 of its source
    src = jnp.repeat(jnp.arange(n_frames), M)
    ii, jj, kk = [], [], []
    for e in range(Nk):
        i = int(src[e])
        for j in range(max(0, i - 2), min(n_frames, i + 3)):
            if j != i:
                ii.append(i), jj.append(j), kk.append(e)
    ii, jj, kk = map(jnp.asarray, (ii, jj, kk))
    intr_full = jnp.tile(INTR[None], (n_frames, 1))
    coords = pops.transform(poses, patches, intr_full, ii, jj, kk)
    target = coords[:, P // 2, P // 2, :]
    return poses, patches, ii, jj, kk, target


def pose_error(a, b):
    rel = lie.se3_mul(a, lie.se3_inv(b))
    return float(jnp.abs(lie.se3_log(rel)).max())


def run_ba(poses, patches, ii, jj, kk, target, t0, t1, m_base, cfg):
    E = len(ii)
    weight = jnp.ones((E, 2))
    valid = jnp.ones((E,), dtype=bool)
    return bundle_adjust(poses, patches, INTR, target, weight, 1e-4,
                         ii, jj, kk, valid, t0, t1, m_base, cfg)


def reproj_residual(poses, patches, ii, jj, kk, target):
    intr_full = jnp.tile(INTR[None], (poses.shape[0], 1))
    coords = pops.transform(poses, patches, intr_full, ii, jj, kk)
    return float(jnp.linalg.norm(coords[:, 1, 1, :] - target, axis=-1).mean())


def test_ba_recovers_perturbed_poses():
    key = jax.random.PRNGKey(0)
    poses, patches, ii, jj, kk, target = build_scene(key)
    n = poses.shape[0]
    noise = 0.01 * jax.random.normal(jax.random.fold_in(key, 1), (n, 6))
    noise = noise.at[0].set(0.0)
    poses0 = lie.se3_mul(lie.se3_exp(noise), poses)

    cfg = BAConfig(window=8, patch_slots=patches.shape[0], iterations=12)
    poses1, patches1 = run_ba(poses0, patches, ii, jj, kk, target,
                              1, n, 0, cfg)
    # monocular BA has a scale gauge; assert in image space where the
    # solution is observable
    r0 = reproj_residual(poses0, patches, ii, jj, kk, target)
    r1 = reproj_residual(poses1, patches1, ii, jj, kk, target)
    assert r1 < 0.05 * r0, (r0, r1)
    assert r1 < 0.05, r1


def test_ba_recovers_depth_structure_only():
    key = jax.random.PRNGKey(2)
    poses, patches, ii, jj, kk, target = build_scene(key)
    bad = patches.at[:, 2].set(0.5)
    cfg = BAConfig(window=8, patch_slots=patches.shape[0], iterations=8)
    # t0 == t1 -> structure-only (no pose updates)
    _, rec = run_ba(poses, bad, ii, jj, kk, target, poses.shape[0],
                    poses.shape[0], 0, cfg)
    err = np.abs(np.asarray(rec[:, 2, 1, 1]) - np.asarray(patches[:, 2, 1, 1]))
    # patches observed from multiple views should triangulate back
    assert np.median(err) < 0.02, np.median(err)


def test_ba_fixed_poses_untouched():
    key = jax.random.PRNGKey(3)
    poses, patches, ii, jj, kk, target = build_scene(key)
    n = poses.shape[0]
    noise = 0.01 * jax.random.normal(jax.random.fold_in(key, 1), (n, 6))
    poses0 = lie.se3_mul(lie.se3_exp(noise), poses)
    cfg = BAConfig(window=4, patch_slots=patches.shape[0], iterations=2)
    t0 = 2
    poses1, _ = run_ba(poses0, patches, ii, jj, kk, target, t0, n, 0, cfg)
    np.testing.assert_allclose(np.asarray(poses1[:t0]),
                               np.asarray(poses0[:t0]), atol=0)


def test_ba_robust_to_outliers():
    key = jax.random.PRNGKey(4)
    poses, patches, ii, jj, kk, target = build_scene(key)
    n = poses.shape[0]
    E = len(ii)
    # corrupt 10% of targets wildly; the |r| < 128 mask plus confidence
    # weights must keep the solve stable (finite, converging)
    bad = jax.random.bernoulli(jax.random.fold_in(key, 5), 0.1, (E,))
    target_bad = jnp.where(bad[:, None], target + 500.0, target)
    noise = 0.005 * jax.random.normal(jax.random.fold_in(key, 6), (n, 6))
    noise = noise.at[0].set(0.0)
    poses0 = lie.se3_mul(lie.se3_exp(noise), poses)
    cfg = BAConfig(window=8, patch_slots=patches.shape[0], iterations=6)
    poses1, _ = run_ba(poses0, patches, ii, jj, kk, target_bad, 1, n, 0, cfg)
    assert np.all(np.isfinite(np.asarray(poses1)))
    assert pose_error(poses1, poses) < pose_error(poses0, poses)


def test_ba_m_base_offset_and_padding():
    key = jax.random.PRNGKey(5)
    poses, patches, ii, jj, kk, target = build_scene(key)
    n = poses.shape[0]
    noise = 0.01 * jax.random.normal(jax.random.fold_in(key, 1), (n, 6))
    noise = noise.at[0].set(0.0)
    poses0 = lie.se3_mul(lie.se3_exp(noise), poses)

    # restrict live patches to sources >= 2 via m_base; pad edge list
    M = 24
    m_base = 2 * M
    E = len(ii)
    pad = 37
    ii_p = jnp.pad(ii, (0, pad))
    jj_p = jnp.pad(jj, (0, pad))
    kk_p = jnp.pad(kk, (0, pad))
    target_p = jnp.pad(target, ((0, pad), (0, 0)))
    weight = jnp.pad(jnp.ones((E, 2)), ((0, pad), (0, 0)))
    valid = jnp.concatenate([jnp.ones(E, bool), jnp.zeros(pad, bool)])

    cfg = BAConfig(window=8, patch_slots=patches.shape[0] - m_base,
                   iterations=4)
    poses1, patches1 = bundle_adjust(
        poses0, patches, INTR, target_p, weight, 1e-4,
        ii_p, jj_p, kk_p, valid, 1, n, m_base, cfg)
    # patches below m_base untouched
    np.testing.assert_allclose(np.asarray(patches1[:m_base]),
                               np.asarray(patches[:m_base]), atol=0)
    assert np.all(np.isfinite(np.asarray(poses1)))
    assert pose_error(poses1, poses) < pose_error(poses0, poses)


def test_ba_failure_containment_nan_targets():
    """Degenerate input (all-NaN targets) must not poison the state: the
    rebuilt solver mirrors the reference's zero-returning Cholesky +
    try/except "BA failed" (`dpvo/ba.py:14-26`, `dpvo/dpvo.py:678-682`)."""
    key = jax.random.PRNGKey(7)
    poses, patches, ii, jj, kk, target = build_scene(key)
    n = poses.shape[0]
    target_nan = jnp.full_like(target, jnp.nan)
    cfg = BAConfig(window=8, patch_slots=patches.shape[0], iterations=4)
    poses1, patches1 = run_ba(poses, patches, ii, jj, kk, target_nan,
                              1, n, 0, cfg)
    assert np.all(np.isfinite(np.asarray(poses1)))
    assert np.all(np.isfinite(np.asarray(patches1)))


def test_ba_failure_containment_nan_depths():
    """NaN inverse depths (poisoned map) must not spread to the poses."""
    key = jax.random.PRNGKey(8)
    poses, patches, ii, jj, kk, target = build_scene(key)
    n = poses.shape[0]
    bad = patches.at[:, 2].set(jnp.nan)
    cfg = BAConfig(window=8, patch_slots=patches.shape[0], iterations=2)
    poses1, _ = run_ba(poses, bad, ii, jj, kk, target, 1, n, 0, cfg)
    assert np.all(np.isfinite(np.asarray(poses1)))
    np.testing.assert_allclose(np.asarray(poses1), np.asarray(poses),
                               atol=1e-6)


def test_ba_singular_system_keeps_poses():
    """A rank-deficient system (single edge, zero weight on one axis) that
    would make S singular without damping: poses stay finite and tracking
    can continue."""
    key = jax.random.PRNGKey(9)
    poses, patches, ii, jj, kk, target = build_scene(key)
    n = poses.shape[0]
    E = len(ii)
    weight = jnp.zeros((E, 2))          # zero information -> S = lm-damped I
    valid = jnp.ones((E,), dtype=bool)
    cfg = BAConfig(window=8, patch_slots=patches.shape[0], iterations=2)
    poses1, patches1 = bundle_adjust(poses, patches, INTR, target, weight,
                                     1e-4, ii, jj, kk, valid, 1, n, 0, cfg)
    assert np.all(np.isfinite(np.asarray(poses1)))
    np.testing.assert_allclose(np.asarray(poses1), np.asarray(poses),
                               atol=1e-5)


def test_depth_prior_regularization():
    """mu*L prior term (`dpvo/ba.py:151-159`): patches with a positive
    prior disparity are pulled toward it; patches without are untouched by
    the regularizer."""
    import jax.numpy as jnp
    from wild_video_3d_reconstruction_tpu.ba.gauss_newton import (BAConfig,
                                                                  bundle_adjust)

    M, P = 6, 3
    poses = jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0]), (2, 1))
    patches = jnp.zeros((M, 3, P, P))
    patches = patches.at[:, 0].set(20.0).at[:, 1].set(15.0)
    patches = patches.at[:, 2].set(0.5)
    prior = jnp.zeros((M, 3, P, P)).at[:3, 2].set(2.0)  # prior on patches 0-2

    # no observations at all: zero-weight edges -> only the prior acts
    E = 4
    ii = jnp.zeros(E, jnp.int32)
    jj = jnp.ones(E, jnp.int32)
    kk = jnp.arange(E, dtype=jnp.int32)
    target = jnp.zeros((E, 2))
    weight = jnp.zeros((E, 2))
    valid = jnp.ones(E, bool)
    cfg = BAConfig(window=2, patch_slots=M, iterations=3)

    _, out = bundle_adjust(poses, patches, jnp.asarray([30., 30., 20., 15.]),
                           target, weight, 1e-4, ii, jj, kk, valid,
                           t0=jnp.int32(1), t1=jnp.int32(2),
                           m_base=jnp.int32(0), cfg=cfg,
                           patches_est=prior)
    d = np.asarray(out[:, 2, 0, 0])
    # prior-backed patches move toward 2.0; others stay at 0.5
    assert np.all(d[:3] > 0.9), d
    assert np.allclose(d[3:], 0.5, atol=1e-5), d
