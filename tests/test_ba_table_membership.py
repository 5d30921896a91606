"""Regression tests for the BA patch-table membership root cause.

Round 3 shipped an "unexplained" note: building the BA per-patch table
with okv (valid-masked) membership degraded the oracle-SLAM rollout (ATE
0.04 -> 0.18) even though zero-weight rows should be inert. Round 4
root-caused it (scripts/okv_bisect.py; see the long note in
`slam/steps.py:update_op`):

  1. zero-weight member rows ARE inert — there is no latent masking bug
     (test_zero_weight_table_rows_inert pins this at the solver level);
  2. the membership rules differ in which LIVE edges fit the cap-sized
     table: under okq, dead append rows alias real patch slots and crowd
     the cap, excluding each patch's newest live edges from the depth
     blocks — an accidental bootstrap regularizer. The consistent
     system (okv == the reference's atomicAdd semantics,
     `ba_cuda.cu:294-322,492`) suffers a genuine Gauss-Newton
     inverse-depth collapse under uniform (oracle) weights: near-identity
     initial poses give C ~ 0, Q = 1/(C + 1e-4) explodes the depth step,
     and the 1e-4 floor pins patches at infinity
     (test_bootstrap_membership_collapse pins BOTH behaviors — it fails
     for the identified reason if the shipped membership flips).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from wild_video_3d_reconstruction_tpu.ba.gauss_newton import (
    BAConfig, _bundle_adjust_impl)
from wild_video_3d_reconstruction_tpu.slam import DPVO, steps
from wild_video_3d_reconstruction_tpu.utils.config import DPVOConfig

from test_slam_oracle import N_FRAMES, gt_trajectory, make_oracle_update
from test_slam_smoke import HT, WD, synthetic_frames


def _small_problem(seed=0):
    rng = np.random.default_rng(seed)
    N, Nk, E, M_ = 6, 24, 64, 24
    poses = np.zeros((N, 7), np.float32)
    poses[:, :3] = 0.1 * rng.normal(size=(N, 3))
    poses[:, 6] = 1.0
    patches = np.zeros((Nk, 3, 3, 3), np.float32)
    patches[:, 0] = rng.uniform(8, 120, (Nk, 1, 1))
    patches[:, 1] = rng.uniform(8, 88, (Nk, 1, 1))
    patches[:, 2] = rng.uniform(0.3, 2.0, (Nk, 1, 1))
    intr = jnp.asarray([60.0, 60.0, 64.0, 48.0], jnp.float32)
    ii = rng.integers(0, N, E).astype(np.int32)
    jj = rng.integers(0, N, E).astype(np.int32)
    kk = rng.integers(0, Nk, E).astype(np.int32)
    target = rng.uniform(0, 128, (E, 2)).astype(np.float32)
    weight = rng.uniform(0.2, 1.0, (E, 2)).astype(np.float32)
    valid = np.ones((E,), np.float32)
    # make the last quarter of rows DEAD: zero weight, zero valid
    weight[48:] = 0.0
    valid[48:] = 0.0
    return (jnp.asarray(poses), jnp.asarray(patches), intr,
            jnp.asarray(target), jnp.asarray(weight), jnp.asarray(ii),
            jnp.asarray(jj), jnp.asarray(kk), jnp.asarray(valid))


def _table_from_members(kk, member_mask, M_, cap):
    """Reference-free table: per patch, member row ids in index order."""
    E = kk.shape[0]
    tab = np.full((M_, cap), E, np.int32)
    for m in range(M_):
        rows = np.where((np.asarray(kk) == m) & np.asarray(member_mask))[0]
        tab[m, :min(len(rows), cap)] = rows[:cap]
    return jnp.asarray(tab)


def test_zero_weight_table_rows_inert():
    """Adding zero-weight rows to the table must not change the solve —
    unless they crowd a LIVE row past the cap."""
    (poses, patches, intr, target, weight, ii, jj, kk,
     valid) = _small_problem()
    cap = 12
    cfg = BAConfig(window=8, patch_slots=24, iterations=2, per_patch_cap=cap)
    live = np.asarray(valid) > 0
    t_live = _table_from_members(kk, live, 24, cap)
    t_all = _table_from_members(kk, np.ones_like(live), 24, cap)

    out_live = _bundle_adjust_impl(
        poses, patches, intr, target, weight, 1e-4, ii, jj, kk, valid,
        jnp.int32(1), jnp.int32(6), jnp.int32(0), cfg, patch_table=t_live)
    out_all = _bundle_adjust_impl(
        poses, patches, intr, target, weight, 1e-4, ii, jj, kk, valid,
        jnp.int32(1), jnp.int32(6), jnp.int32(0), cfg, patch_table=t_all)

    # with cap=12 no patch overflows (E=64 over 24 slots), so the dead
    # rows are pure zero-contribution padding: solves must be identical
    np.testing.assert_allclose(np.asarray(out_live[0]),
                               np.asarray(out_all[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_live[1]),
                               np.asarray(out_all[1]), atol=1e-6)


@pytest.mark.slow
def test_bootstrap_membership_collapse():
    """The 12-iteration bootstrap stays healthy under the shipped
    okq_prefix table and COLLAPSES (depths at the 1e-4 floor) under the
    consistent okv table.

    r5 status of the root cause: the collapse is REFERENCE-FAITHFUL — the
    reference's own python BA (`dpvo/ba.py:86`), run on bootstrap inputs
    captured from this very pipeline, produces the identical depth
    collapse (median/floor-fraction agree to 3 decimals with our dense
    consistent solver; forensic scripts in the r5 session, summarized in
    `slam/steps.py:update_op`). okq_prefix is therefore not an accidental
    regularizer masking a rebuild bug: it is a deliberate, understood
    improvement over reference semantics — during bootstrap each patch's
    depth block sees its earliest (small-baseline) edges first while the
    pose blocks see everything, a graduated-optimization effect. Five
    principled dampings (bootstrap lambda schedule, additive depth trust
    region, gauge renormalization, log-space ratio-clamped retraction,
    C-relative floors) were each tested against captured inputs and none
    rescues the consistent system, because half the patches receive
    persistently negative depth signal under uniform oracle weights on
    these worlds — the same signal the reference integrates."""
    def bootstrap_depths(mode):
        steps._BA_TABLE_MODE = mode
        gt = gt_trajectory()
        orig = steps._run_update_net
        steps._run_update_net = make_oracle_update(gt)
        try:
            cfg = DPVOConfig(
                BUFFER_SIZE=64, PATCHES_PER_FRAME=8,
                REMOVAL_WINDOW=N_FRAMES + 2,
                OPTIMIZATION_WINDOW=N_FRAMES + 2, PATCH_LIFETIME=10,
                KEYFRAME_INDEX=2, KEYFRAME_THRESH=0.0, MEM=24,
                GRADIENT_BIAS=False, CORR_CHUNK=512, PALLAS_CORR=False)
            slam = DPVO(cfg, None, HT, WD, seed=0)
            slam._probe = lambda *a: 100.0
            intr = np.array([60.0, 60.0, WD / 2, HT / 2])
            for t, img in enumerate(synthetic_frames(N_FRAMES)):
                slam(t, img, intrinsics=intr)
                if slam.is_initialized:
                    break
            n = int(slam.state.n_frames)
            return np.asarray(
                slam.state.patches[:n * 8, 2, 1, 1])
        finally:
            steps._run_update_net = orig
            steps._BA_TABLE_MODE = "okq_prefix"

    d_ship = bootstrap_depths("okq_prefix")
    d_okv = bootstrap_depths("okv")
    floor_frac_ship = float(np.mean(d_ship <= 1.1e-4))
    floor_frac_okv = float(np.mean(d_okv <= 1.1e-4))
    # shipped: healthy depths after bootstrap (well above the 1e-4 floor)
    assert np.median(d_ship) > 0.05, np.median(d_ship)
    assert floor_frac_ship < 0.1, floor_frac_ship
    # okv: the documented collapse — a large fraction of depths pinned at
    # the floor (patches of the newest post-init frame keep their fresh
    # init). If this ever STOPS collapsing, the bootstrap conditioning
    # changed and the membership choice should be re-evaluated.
    assert floor_frac_okv >= 0.3, floor_frac_okv
