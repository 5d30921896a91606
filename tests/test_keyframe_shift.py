"""keyframe_shift slab-copy rewrite vs the index-map gather oracle.

r5 replaced the full-buffer gathers of `slam.steps.keyframe_shift` (13.9
ms/frame at default config) with static-length contiguous slab copies —
only KEYFRAME_INDEX - 1 frames actually move (`dpvo/dpvo.py:611-645`).
This pins exact equality of every state field against the previous
gather formulation on a real mid-run SLAM state.
"""

import numpy as np

import jax.numpy as jnp

from wild_video_3d_reconstruction_tpu.ops import lie
from wild_video_3d_reconstruction_tpu.slam import DPVO, steps
from wild_video_3d_reconstruction_tpu.utils.config import DPVOConfig

HT, WD = 48, 64


def _gather_oracle(cfg, state):
    """The pre-r5 index-map gather implementation (no retirement)."""
    M = cfg.PATCHES_PER_FRAME
    pmem = cfg.pmem
    n = state.n_frames
    k = n - cfg.KEYFRAME_INDEX

    dP = lie.se3_mul(state.poses[k], lie.se3_inv(state.poses[k - 1]))

    valid = state.valid & ~((state.ii == k) | (state.jj == k))
    kk = jnp.where(state.ii > k, state.kk - M, state.kk)
    ii = jnp.where(state.ii > k, state.ii - 1, state.ii)
    jj = jnp.where(state.jj > k, state.jj - 1, state.jj)

    N = state.poses.shape[0]
    fidx = jnp.arange(N, dtype=jnp.int32)
    src_f = jnp.where((fidx >= k) & (fidx < n - 1), fidx + 1, fidx)
    src_f = jnp.clip(src_f, 0, N - 1)

    pidx = jnp.arange(state.patches.shape[0], dtype=jnp.int32)
    src_p = jnp.where((pidx >= k * M) & (pidx < (n - 1) * M), pidx + M, pidx)
    src_p = jnp.clip(src_p, 0, state.patches.shape[0] - 1)

    ridx = jnp.arange(pmem, dtype=jnp.int32)
    i_of_slot = n - 1 - jnp.mod(n - 1 - ridx, pmem)
    shift_r = (i_of_slot >= k) & (i_of_slot < n - 1)
    src_r = jnp.where(shift_r, jnp.mod(i_of_slot + 1, pmem), ridx)

    rpidx = jnp.arange(pmem * M, dtype=jnp.int32)
    rslot = rpidx // M
    src_rp = jnp.where(shift_r[rslot], jnp.mod(i_of_slot[rslot] + 1, pmem)
                       * M + rpidx % M, rpidx)

    return state._replace(
        poses=state.poses[src_f],
        patches=state.patches[src_p],
        patches_est=state.patches_est[src_p],
        intrinsics=state.intrinsics[src_f],
        colors=state.colors[src_f],
        imap=state.imap[src_rp],
        gmap=state.gmap[src_rp],
        fmap1=state.fmap1[src_r],
        fmap2=state.fmap2[src_r],
        ii=ii, jj=jj, kk=kk, valid=valid,
        n_frames=n - 1,
    ), dP


def _run_state(n_frames=14, seed=0):
    cfg = DPVOConfig(
        BUFFER_SIZE=64, PATCHES_PER_FRAME=8, REMOVAL_WINDOW=6,
        OPTIMIZATION_WINDOW=4, PATCH_LIFETIME=3, KEYFRAME_INDEX=3,
        KEYFRAME_THRESH=-1.0,            # never evict during the feed
        MEM=12, GRADIENT_BIAS=False, CORR_CHUNK=512, PALLAS_CORR=False)
    slam = DPVO(cfg, None, HT, WD, seed=seed)
    slam._probe = lambda *a: jnp.float32(100.0)
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 255, size=(2 * HT, 2 * WD, 3), dtype=np.uint8)
    intr = np.array([40.0, 40.0, WD / 2, HT / 2])
    for t in range(n_frames):
        y, x = 4 * t % HT, 6 * t % WD
        slam(t, big[y:y + HT, x:x + WD].copy(), intrinsics=intr)
    return cfg, slam.state


def test_keyframe_shift_matches_gather_oracle():
    cfg, state = _run_state()
    new_state, new_dP = steps.keyframe_shift(cfg, state, retire=False)
    ref_state, ref_dP = _gather_oracle(cfg, state)

    np.testing.assert_allclose(np.asarray(new_dP), np.asarray(ref_dP))
    for name in new_state._fields:
        a, b = getattr(new_state, name), getattr(ref_state, name)
        if a is None or not hasattr(a, "shape"):
            assert np.asarray(a) == np.asarray(b), name
            continue
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_keyframe_shift_ring_wrap():
    """The moved frames straddle the feature-ring wraparound."""
    # n_frames = 14 > pmem = 12: slots of frames 11..13 are 11, 0, 1
    cfg, state = _run_state(n_frames=14)
    assert int(state.n_frames) > cfg.pmem
    new_state, _ = steps.keyframe_shift(cfg, state, retire=False)
    ref_state, _ = _gather_oracle(cfg, state)
    for name in ("imap", "gmap", "fmap1", "fmap2"):
        np.testing.assert_array_equal(
            np.asarray(getattr(new_state, name)),
            np.asarray(getattr(ref_state, name)), err_msg=name)
