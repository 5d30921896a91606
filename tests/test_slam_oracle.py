"""End-to-end geometric accuracy with oracle flow targets.

Replaces the network's flow predictions with ground-truth reprojections of
a known synthetic world (a sphere in front of a translating camera — fully
non-degenerate geometry with closed-form ray intersections). The full
per-frame machinery (insertion, motion model, edge lifecycle, BA, event
log, terminate) must recover the trajectory to near-zero Sim3-aligned
ATE — the "synthetic sequences with known poses -> ATE ~ 0" oracle
SURVEY.md section 4 prescribes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wild_video_3d_reconstruction_tpu.eval import metrics
from wild_video_3d_reconstruction_tpu.ops import lie
from wild_video_3d_reconstruction_tpu.ops import projective as pops
from wild_video_3d_reconstruction_tpu.slam import DPVO, steps
from wild_video_3d_reconstruction_tpu.utils.config import DPVOConfig

from test_slam_smoke import HT, WD, synthetic_frames

pytestmark = pytest.mark.slow  # integration/soak tier


SPHERE_C = 3.0     # sphere center depth (world z)
SPHERE_R = 2.5     # sphere radius
N_FRAMES = 18


def sphere_inverse_depth(xn, yn, t):
    """Closed-form inverse depth of the front sphere surface.

    Ray X_cam = lam * (xn, yn, 1); identity rotations so
    X_w = X_cam - t; solve |X_w - (0, 0, SPHERE_C)|^2 = SPHERE_R^2.
    xn/yn: any broadcastable shape; t: matching [..., 3].
    """
    np_ = jnp if hasattr(xn, "aval") or isinstance(xn, jnp.ndarray) else np
    ux = t[..., 0]
    uy = t[..., 1]
    uz = t[..., 2] + SPHERE_C
    rr = xn * xn + yn * yn + 1.0
    rd = xn * ux + yn * uy + uz
    cc = ux * ux + uy * uy + uz * uz - SPHERE_R ** 2
    disc = np_.sqrt(np_.clip(rd * rd - rr * cc, 1e-6, None))
    lam = (rd - disc) / rr
    return 1.0 / np_.clip(lam, 0.2, None)


def gt_trajectory():
    """Pure-translation camera path (w2c poses with identity rotation)."""
    rng = np.random.default_rng(3)
    t = np.zeros((N_FRAMES, 3), np.float32)
    steps_xy = 0.06 + 0.02 * rng.random((N_FRAMES, 2))
    t[:, 0] = np.cumsum(steps_xy[:, 0])
    t[:, 1] = np.cumsum(0.5 * steps_xy[:, 1])
    t[:, 2] = 0.05 * np.sin(np.arange(N_FRAMES) * 0.7)
    poses = np.zeros((N_FRAMES, 7), np.float32)
    poses[:, :3] = t
    poses[:, 6] = 1.0
    return jnp.asarray(poses)


def make_oracle_update(gt_poses):
    """Oracle replacement for steps._run_update_net: ground-truth targets."""

    def oracle(cfg, params, state, net, ii, jj, kk, valid, n,
               order=None, kk_table=None, nbr=None):
        coords = pops.transform(state.poses, state.patches,
                                state.intrinsics, ii, jj, kk)
        coords = jnp.where(valid[:, None, None, None], coords, 0.0)

        # true inverse depth of the source pixels on the sphere surface
        xy = state.patches[kk][:, :2]
        intr = state.intrinsics[0]
        xn = (xy[:, 0] - intr[2]) / intr[0]
        yn = (xy[:, 1] - intr[3]) / intr[1]
        t = gt_poses[ii, :3][:, None, None, :]
        d_true = sphere_inverse_depth(xn, yn, t)
        patches_gt = jnp.concatenate([xy, d_true[:, None]], axis=1)
        gt_full = jnp.zeros_like(state.poses).at[:gt_poses.shape[0]].set(
            gt_poses)
        # patches_gt is already per-edge -> identity patch indexing
        target = pops.transform(gt_full, patches_gt, state.intrinsics,
                                ii, jj, jnp.arange(ii.shape[0]))[:, 1, 1, :]
        delta = target - coords[:, 1, 1, :]
        weight = jnp.ones_like(delta) * valid[:, None]
        return net, delta, weight, coords

    return oracle


@pytest.fixture()
def oracle_slam(monkeypatch):
    gt = gt_trajectory()
    monkeypatch.setattr(steps, "_run_update_net", make_oracle_update(gt))
    # the optimization window covers the whole run: with a sliding window
    # the early drift is frozen by design (same as the reference), so the
    # oracle -> ATE ~ 0 property only holds for full-window optimization
    cfg = DPVOConfig(
        BUFFER_SIZE=64, PATCHES_PER_FRAME=8, REMOVAL_WINDOW=N_FRAMES + 2,
        OPTIMIZATION_WINDOW=N_FRAMES + 2, PATCH_LIFETIME=10,
        KEYFRAME_INDEX=2,
        KEYFRAME_THRESH=0.0,   # never evict: frame index == input index
        MEM=24, GRADIENT_BIAS=False, CORR_CHUNK=512, PALLAS_CORR=False)
    slam = DPVO(cfg, None, HT, WD, seed=0)
    slam._probe = lambda *a: 100.0
    return slam, gt


def test_oracle_targets_recover_trajectory(oracle_slam):
    slam, gt = oracle_slam
    intr = np.array([60.0, 60.0, WD / 2, HT / 2])
    for t, img in enumerate(synthetic_frames(N_FRAMES)):
        slam(t, img, intrinsics=intr)
    slam.refine(40)
    poses_c2w, tstamps = slam.terminate()

    gt_c2w = np.asarray(lie.se3_inv(gt))
    err, n_assoc = metrics.ate_rmse(poses_c2w, tstamps, gt_c2w,
                                    np.arange(N_FRAMES, dtype=float))
    assert n_assoc == N_FRAMES
    # the trajectory spans ~1.4 units; oracle-driven BA must recover it
    # essentially exactly (r5: with the reference-faithful per-frame
    # warm-up appends — `dpvo/dpvo.py:855-856` — the full bootstrap graph
    # at this realistic ~56-degree FOV converges to machine-level ATE;
    # the old 0.06 bound dated from the star-graph bootstrap era).
    # NOTE the world's old fx=240 (~11-degree telephoto FOV) is a regime
    # where monocular bootstrap BA genuinely collapses — verified
    # reference-faithful: the reference's own python BA produces the
    # identical depth collapse on captured bootstrap inputs (r5 forensic
    # runs; see slam/steps.py update_op's membership note).
    assert err < 0.02, err


def test_oracle_depths_converge(oracle_slam):
    slam, gt = oracle_slam
    intr = np.array([60.0, 60.0, WD / 2, HT / 2])
    for t, img in enumerate(synthetic_frames(N_FRAMES)):
        slam(t, img, intrinsics=intr)
    slam.refine(40)
    slam._replay_log()
    n = slam.n_host
    # after Sim3-free BA the scale is arbitrary; compare depth RATIOS to the
    # ground-truth plane depths
    d_est = np.asarray(slam.state.patches[: n * slam.M, 2, 1, 1])
    # recompute the oracle depths for the selected patches
    M = slam.M
    xy = np.asarray(slam.state.patches[: n * M, :2, 1, 1])
    intr = np.asarray(slam.state.intrinsics[0])
    xn = (xy[:, 0] - intr[2]) / intr[0]
    yn = (xy[:, 1] - intr[3]) / intr[1]
    t = np.asarray(gt[:, :3])[np.repeat(np.arange(n), M)]
    d_true = sphere_inverse_depth(xn, yn, t)
    sel = slice(0, (n - 4) * M)
    ratio = d_est[sel] / d_true[sel]
    spread = np.quantile(ratio, 0.9) / np.quantile(ratio, 0.1)
    assert spread < 1.15, spread
