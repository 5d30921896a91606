"""Global bundle adjustment path on a tiny synthetic run."""

import numpy as np
import pytest

import jax.numpy as jnp

from wild_video_3d_reconstruction_tpu.slam import DPVO
from wild_video_3d_reconstruction_tpu.slam.global_ba import (propose_edges,
                                                             run_global_ba)

from test_slam_smoke import HT, WD, synthetic_frames, tiny_config

pytestmark = pytest.mark.slow  # integration/soak tier



@pytest.fixture(scope="module")
def slam_gba():
    cfg = tiny_config(ENABLE_GLOBAL_BA=True, USE_DISTANCE_EDGES=True,
                      DISTANCE_THRESH=1e6, MEM=64, BUFFER_SIZE=64)
    slam = DPVO(cfg, None, HT, WD, seed=0, sync_mode=True)
    slam._probe = lambda *a: jnp.float32(100.0)
    intr = np.array([40.0, 40.0, WD / 2, HT / 2])
    for t, img in enumerate(synthetic_frames(16)):
        slam(t, img, intrinsics=intr)
    return slam


def test_propose_edges(slam_gba):
    ii, jj = propose_edges(slam_gba.cfg, slam_gba)
    n = slam_gba.n
    # sequential chain always present
    seq = set(zip(ii.tolist(), jj.tolist()))
    for i in range(n - 1):
        assert (i, i + 1) in seq
    assert np.all(jj > ii) or np.all(jj != ii)


def test_global_ba_runs_and_stays_finite(slam_gba):
    poses_before = np.asarray(slam_gba.state.poses[:slam_gba.n]).copy()
    run_global_ba(slam_gba.cfg, slam_gba, iterations=1, max_edges=64)
    poses_after = np.asarray(slam_gba.state.poses[:slam_gba.n])
    assert np.all(np.isfinite(poses_after))
    qn = np.linalg.norm(poses_after[:, 3:], axis=-1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-3)


def test_geo_consistency_and_inlier_record(slam_gba, tmp_path):
    _, ratio = slam_gba.geo_consistency_check(slam_gba.n - 2, slam_gba.n - 3)
    assert 0.0 <= ratio <= 1.0
    rec = slam_gba.save_inlier_ratio_record(str(tmp_path))
    assert (tmp_path / "inlier_ratio_record.txt").exists()
    assert (tmp_path / "time_stamp.txt").exists()
