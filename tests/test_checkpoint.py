"""Mid-run SLAM checkpoint / resume (slam/checkpoint.py).

A resumed run must continue bit-identically: same poses, same
bookkeeping, same trajectory at terminate."""

import numpy as np
import pytest

from wild_video_3d_reconstruction_tpu.slam import DPVO
from wild_video_3d_reconstruction_tpu.slam.checkpoint import (load_slam,
                                                              save_slam)

from test_slam_smoke import HT, WD, synthetic_frames, tiny_config

pytestmark = pytest.mark.slow  # integration/soak tier


N = 20
SPLIT = 14


def test_checkpoint_resume_bitexact(tmp_path):
    frames = synthetic_frames(N)
    intr = np.array([40.0, 40.0, WD / 2, HT / 2])

    cfg = tiny_config()
    a = DPVO(cfg, None, HT, WD, seed=0)
    a._probe = lambda *x: 100.0
    for t in range(SPLIT):
        a(t, frames[t], intrinsics=intr)
    save_slam(a, tmp_path / "ckpt")

    b = DPVO(tiny_config(), None, HT, WD, seed=0)
    b._probe = lambda *x: 100.0
    load_slam(b, tmp_path / "ckpt")
    assert b.counter == a.counter
    assert b.n_host == a.n_host
    assert b.is_initialized == a.is_initialized

    for t in range(SPLIT, N):
        a(t, frames[t], intrinsics=intr)
        b(t, frames[t], intrinsics=intr)

    pa, ta = a.terminate()
    pb, tb = b.terminate()
    np.testing.assert_array_equal(ta, tb)
    np.testing.assert_allclose(pa, pb, rtol=0, atol=0)
