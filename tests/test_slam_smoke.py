"""End-to-end SLAM smoke test on synthetic frames with random weights.

Exercises the whole per-frame machinery (insert, probe, warm-up bootstrap,
tracking, keyframe eviction, retirement, terminate) mechanically: the system
must run, keep all state finite, and emit a full-length trajectory. Accuracy
is covered separately by the BA oracle tests (network weights are random
here).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wild_video_3d_reconstruction_tpu.slam import DPVO
from wild_video_3d_reconstruction_tpu.utils.config import DPVOConfig

pytestmark = pytest.mark.slow  # integration/soak tier


HT, WD = 48, 64


def tiny_config(**kw):
    base = dict(
        BUFFER_SIZE=64,
        PATCHES_PER_FRAME=8,
        REMOVAL_WINDOW=6,
        OPTIMIZATION_WINDOW=4,
        PATCH_LIFETIME=3,
        KEYFRAME_INDEX=2,
        KEYFRAME_THRESH=12.5,
        MEM=12,
        GRADIENT_BIAS=False,
        CORR_CHUNK=512,
        PALLAS_CORR=False,
    )
    base.update(kw)
    return DPVOConfig(**base)


def synthetic_frames(n, seed=0):
    """A drifting random texture (gives the encoders real structure)."""
    rng = np.random.default_rng(seed)
    big = (rng.uniform(0, 255, size=(HT * 2, WD * 2, 3))).astype(np.uint8)
    frames = []
    for t in range(n):
        y, x = 4 * t % HT, 6 * t % WD
        frames.append(big[y:y + HT, x:x + WD].copy())
    return frames


@pytest.fixture(scope="module")
def slam_run():
    cfg = tiny_config()
    slam = DPVO(cfg, None, HT, WD, seed=0)
    slam._probe = lambda *a: jnp.float32(100.0)  # bypass motion gating
    intr = np.array([40.0, 40.0, WD / 2, HT / 2])
    frames = synthetic_frames(18)
    for t, img in enumerate(frames):
        slam(t, img, intrinsics=intr)
    return slam, len(frames)


def test_runs_and_initializes(slam_run):
    slam, n_input = slam_run
    assert slam.is_initialized
    assert slam.counter == n_input
    assert 0 < slam.n <= n_input


def test_state_finite(slam_run):
    slam, _ = slam_run
    n = slam.n
    poses = np.asarray(slam.state.poses[:n])
    assert np.all(np.isfinite(poses))
    # quaternions stay normalized through retractions
    qn = np.linalg.norm(poses[:, 3:7], axis=-1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-3)
    patches = np.asarray(slam.state.patches[:n * slam.M])
    assert np.all(np.isfinite(patches))
    assert np.all(patches[:, 2] > 0)


def test_edge_table_consistent(slam_run):
    slam, _ = slam_run
    st = slam.state
    n = slam.n
    valid = np.asarray(st.valid)
    ii = np.asarray(st.ii)[valid]
    jj = np.asarray(st.jj)[valid]
    kk = np.asarray(st.kk)[valid]
    assert len(ii) > 0
    assert ii.max() < n and jj.max() < n
    assert np.all(kk // slam.M == ii)
    # compaction keeps valid edges in a prefix
    ne = int(st.n_edges)
    assert valid[:ne].all() or not valid[ne:].any()
    # removal window respected
    assert np.all(ii >= n - slam.cfg.REMOVAL_WINDOW - 1)


def test_terminate_full_trajectory(slam_run):
    slam, n_input = slam_run
    poses, tstamps = slam.terminate()
    assert poses.shape == (n_input, 7)
    assert tstamps.shape == (n_input,)
    assert np.all(np.isfinite(poses))


def test_points_and_colors(slam_run):
    slam, _ = slam_run
    pts, clr = slam.points_and_colors()
    assert pts.shape[0] == clr.shape[0]
    assert np.all(np.isfinite(pts))
