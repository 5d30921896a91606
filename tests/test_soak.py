"""Long-horizon soak: ring-buffer wraparound, long eviction chains.

Short smoke tests never wrap the pmem feature ring (12 slots here) or
build deep delta chains; 120 frames with eviction-heavy settings do. The
run must stay finite, keep host/device bookkeeping consistent, and
account for every input frame at terminate."""

import numpy as np
import pytest

from wild_video_3d_reconstruction_tpu.slam import DPVO

from test_slam_smoke import HT, WD, tiny_config

N = 120


@pytest.mark.slow
def test_long_run_wraparound_and_chains():
    rng = np.random.default_rng(0)
    big = rng.integers(0, 255, size=(HT * 3, WD * 3, 3), dtype=np.uint8)
    cfg = tiny_config(BUFFER_SIZE=128)
    slam = DPVO(cfg, None, HT, WD, seed=0)
    slam._probe = lambda *a: 100.0
    intr = np.array([40.0, 40.0, WD / 2, HT / 2])
    for t in range(N):
        y = (3 * t) % (2 * HT)
        x = (5 * t) % (2 * WD)
        slam(t, np.ascontiguousarray(big[y:y + HT, x:x + WD]),
             intrinsics=intr)

    poses, tstamps = slam.terminate()
    assert poses.shape == (N, 7)
    assert np.isfinite(poses).all()
    np.testing.assert_array_equal(np.sort(tstamps), np.arange(N))

    # host bookkeeping consistent with device state after replay
    assert slam.n_host == int(slam.state.n_frames)
    kept = set(int(t) for t in slam.tstamps[:slam.n_host])
    dropped = set(slam.delta)
    assert kept | dropped == set(range(N))
    assert not kept & dropped
    # the feature ring wrapped at least a few times
    assert N > 3 * cfg.pmem
