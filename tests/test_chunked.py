"""Chunked steady-state dispatch (cfg.PIPELINE_CHUNK) equivalence.

`chunk_step` is frame_step lax.scan-ed over K stacked frames — the math is
identical to K single-frame dispatches; these tests pin that equivalence
(including the partial-tail flush on terminate) so the throughput
optimization can never drift from the reference semantics.
"""

import numpy as np
import pytest

from wild_video_3d_reconstruction_tpu.slam import DPVO

from test_slam_smoke import synthetic_frames, tiny_config

pytestmark = pytest.mark.slow  # integration/soak tier


HT, WD = 48, 64
INTR = np.array([60.0, 60.0, WD / 2, HT / 2])


def run_slam(chunk, n_frames, depth=False):
    cfg = tiny_config(PIPELINE_CHUNK=chunk, MOTION_PROBE_THRESH=-1.0)
    slam = DPVO(cfg, None, HT, WD, seed=0)
    rng = np.random.default_rng(3)
    for t, img in enumerate(synthetic_frames(n_frames)):
        dep = (1.0 + rng.random((HT, WD)).astype(np.float32)) if depth \
            else None
        slam(t, img, depth=dep, intrinsics=INTR)
    traj, tstamps = slam.terminate()
    return slam, traj, tstamps


def test_chunked_matches_single_frame():
    # 21 tracked frames = 10 warmup + 11 steady (not a multiple of 4:
    # exercises the partial-tail flush through the single-frame program)
    s1, traj1, ts1 = run_slam(1, 21)
    s4, traj4, ts4 = run_slam(4, 21)
    assert traj1.shape == traj4.shape
    np.testing.assert_array_equal(ts1, ts4)
    np.testing.assert_allclose(traj4, traj1, rtol=0, atol=5e-4)
    assert int(s1.state.n_frames) == int(s4.state.n_frames)
    assert int(s1.state.n_edges) == int(s4.state.n_edges)
    np.testing.assert_array_equal(np.asarray(s1.state.ii),
                                  np.asarray(s4.state.ii))
    assert s1._events_dispatched == s4._events_dispatched


def test_chunked_with_depth_input():
    s1, traj1, ts1 = run_slam(1, 18, depth=True)
    s3, traj3, ts3 = run_slam(3, 18, depth=True)
    np.testing.assert_array_equal(ts1, ts3)
    np.testing.assert_allclose(traj3, traj1, rtol=0, atol=5e-4)


def test_signature_change_flushes_mid_chunk():
    """Switching depth on/off mid-stream must flush the pending chunk
    rather than mixing signatures inside one scan."""
    cfg = tiny_config(PIPELINE_CHUNK=4, MOTION_PROBE_THRESH=-1.0)
    slam = DPVO(cfg, None, HT, WD, seed=0)
    frames = synthetic_frames(16)
    for t, img in enumerate(frames):
        dep = np.full((HT, WD), 2.0, np.float32) if (12 <= t < 14) else None
        slam(t, img, depth=dep, intrinsics=INTR)
    traj, ts = slam.terminate()
    assert traj.shape[0] == 16
    assert np.isfinite(traj).all()
