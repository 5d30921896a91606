"""Sort-free index builders vs their argsort formulations.

The per-frame argsorts (corr frame bucketing, neighbor links, BA patch
grouping, compaction) measured ~10 ms each at default-config edge
capacities on v5e (scripts/sort_micro.py) — a leading share of the
154 ms/frame default-config step. These tests pin the replacements:

  * `_bucket_by_frame` (counting + one scatter) == `_bucket_by_frame_sort`
  * `compact_valid` (two cumsums + scatter) == stable-argsort partition
  * `neighbors(order=...)` (one shared sort) == `neighbors()` — on a REAL
    evolved SLAM edge table, which also asserts the within-patch
    ascending-jj invariant the shared sort relies on.
"""

import jax
import jax.numpy as jnp
import numpy as np

from wild_video_3d_reconstruction_tpu.ops.pallas_corr import (
    _bucket_by_frame, _bucket_by_frame_sort)
from wild_video_3d_reconstruction_tpu.ops.segment import (compact_valid,
                                                          neighbors)


def _random_edges(rng, E, F, live_frac):
    jj = rng.integers(0, F, E).astype(np.int32)
    valid = rng.random(E) < live_frac
    return jnp.asarray(jj), jnp.asarray(valid)


def test_bucket_counting_matches_sort():
    rng = np.random.default_rng(0)
    for E, F, eb, frac in [(256, 5, 32, 0.7), (1024, 12, 32, 0.2),
                           (2048, 36, 128, 0.9), (512, 3, 128, 0.0)]:
        jj, valid = _random_edges(rng, E, F, frac)
        n_slots = ((E + eb - 1) // eb) * eb + (F + 1) * eb
        se_c, soe_c, bm_c = jax.jit(
            lambda j, v: _bucket_by_frame(j, F, n_slots, v, eb))(jj, valid)
        se_s, soe_s, bm_s = jax.jit(
            lambda j, v: _bucket_by_frame_sort(j, F, n_slots, v, eb)
        )(jj, valid)
        np.testing.assert_array_equal(np.asarray(se_c), np.asarray(se_s))
        np.testing.assert_array_equal(np.asarray(soe_c), np.asarray(soe_s))
        # the source-block column must agree everywhere; the frame column
        # only matters where it is consumed (via src aliasing)
        bm_c, bm_s = np.asarray(bm_c), np.asarray(bm_s)
        np.testing.assert_array_equal(bm_c[:, 1], bm_s[:, 1])
        src = bm_s[:, 1]
        np.testing.assert_array_equal(bm_c[src, 0], bm_s[src, 0])


def test_compact_valid_matches_argsort():
    rng = np.random.default_rng(1)
    for E, frac in [(64, 0.5), (1024, 0.9), (512, 0.0), (512, 1.0)]:
        valid = jnp.asarray(rng.random(E) < frac)
        perm, n_valid = jax.jit(compact_valid)(valid)
        key = np.where(np.asarray(valid), np.arange(E), E + np.arange(E))
        ref_perm = np.argsort(key, kind="stable")
        np.testing.assert_array_equal(np.asarray(perm), ref_perm)
        assert int(n_valid) == int(np.asarray(valid).sum())


def test_neighbors_shared_order_on_evolved_state():
    """Track a real sequence; on every accepted frame's edge table, the
    one-sort neighbors must equal the two-sort reference, and the
    within-patch ascending-jj invariant must hold."""
    from test_slam_smoke import HT, WD, synthetic_frames, tiny_config

    from wild_video_3d_reconstruction_tpu.slam import DPVO

    cfg = tiny_config()
    slam = DPVO(cfg, None, HT, WD, seed=0)
    slam._probe = lambda *a: 100.0
    frames = synthetic_frames(28)
    intr = np.array([80.0, 80.0, WD / 2, HT / 2])

    checked = 0
    for t, img in enumerate(frames):
        slam(t, img, intrinsics=intr)
        if not slam.is_initialized or t % 5:
            continue
        slam._flush_pending()
        st = slam.state
        kk = np.asarray(st.kk)
        jj = np.asarray(st.jj)
        valid = np.asarray(st.valid)

        # invariant: within each patch, live edges appear target-ascending
        for u in np.unique(kk[valid]):
            tgt = jj[valid & (kk == u)]
            assert np.all(np.diff(tgt) >= 0), (u, tgt)

        order = jnp.argsort(jnp.where(st.valid, st.kk, jnp.int32(1 << 30)),
                            stable=True)
        ix_ref, jx_ref = neighbors(st.kk, st.jj, valid=st.valid)
        ix_new, jx_new = neighbors(st.kk, st.jj, valid=st.valid,
                                   order=order)
        np.testing.assert_array_equal(np.asarray(ix_new),
                                      np.asarray(ix_ref))
        np.testing.assert_array_equal(np.asarray(jx_new),
                                      np.asarray(jx_ref))
        checked += 1
    assert checked >= 3


def test_segment_softmax_table_matches_scatter():
    """The member-table SoftAgg formulation equals the scatter-segment
    formulation (same per-segment max stabilization)."""
    from wild_video_3d_reconstruction_tpu.ba.gauss_newton import \
        _group_by_patch
    from wild_video_3d_reconstruction_tpu.ops.segment import (
        segment_softmax_weighted_sum, segment_softmax_weighted_sum_table)

    rng = np.random.default_rng(3)
    E, S, D, cap = 300, 40, 16, 32
    seg = jnp.asarray(rng.integers(0, S, E), jnp.int32)
    valid = jnp.asarray(rng.random(E) < 0.8)
    f = jnp.asarray(rng.normal(size=(E, D)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(E, D)), jnp.float32)

    ref = segment_softmax_weighted_sum(f, g, seg, S, valid=valid)
    table = _group_by_patch(seg, valid, S, cap)
    out = segment_softmax_weighted_sum_table(f, g, table, seg, valid)
    # the formulations differ only on INVALID rows (scatter reads back
    # the segment value, table reads zero) — both are inert downstream
    # (invalid edges carry zero weight); compare the live rows
    v = np.asarray(valid)
    np.testing.assert_allclose(np.asarray(out)[v], np.asarray(ref)[v],
                               atol=1e-5, rtol=1e-5)
