"""Tests for segment softmax aggregation and neighbor index computation."""

import jax
import jax.numpy as jnp
import numpy as np

from wild_video_3d_reconstruction_tpu.ops import segment


def naive_softagg(f, g, seg):
    """Straight numpy translation of scatter_softmax + scatter_sum."""
    out = np.zeros_like(f)
    for s in np.unique(seg):
        m = seg == s
        gs = g[m]
        w = np.exp(gs - gs.max(0, keepdims=True))
        w = w / w.sum(0, keepdims=True)
        y = (f[m] * w).sum(0)
        out[m] = y
    return out


def naive_neighbors(kk, jj):
    """Python re-statement of the fastba.neighbors contract."""
    E = len(kk)
    ix = -np.ones(E, dtype=int)
    jx = -np.ones(E, dtype=int)
    for u in np.unique(kk):
        idx = [i for i in range(E) if kk[i] == u]
        idx = sorted(idx, key=lambda i: jj[i])  # python sort is stable
        for r, e in enumerate(idx):
            ix[e] = idx[r - 1] if r > 0 else -1
            jx[e] = idx[r + 1] if r < len(idx) - 1 else -1
    return ix, jx


def test_segment_softmax_matches_naive():
    rng = np.random.default_rng(0)
    E, D, S = 64, 8, 10
    f = rng.normal(size=(E, D)).astype(np.float32)
    g = rng.normal(size=(E, D)).astype(np.float32)
    seg = rng.integers(0, S, size=E).astype(np.int32)
    out = segment.segment_softmax_weighted_sum(f, g, seg, S)
    np.testing.assert_allclose(np.asarray(out), naive_softagg(f, g, seg),
                               atol=1e-5)


def test_segment_softmax_with_padding():
    rng = np.random.default_rng(1)
    E, D, S = 64, 4, 6
    f = rng.normal(size=(E, D)).astype(np.float32)
    g = rng.normal(size=(E, D)).astype(np.float32)
    seg = rng.integers(0, S - 1, size=E).astype(np.int32)
    valid = rng.random(E) > 0.3

    out = segment.segment_softmax_weighted_sum(f, g, seg, S, valid=valid)
    ref = naive_softagg(f[valid], g[valid], seg[valid])
    np.testing.assert_allclose(np.asarray(out)[valid], ref, atol=1e-5)
    # empty-segment / invalid rows must be finite
    assert np.all(np.isfinite(np.asarray(out)))


def test_neighbors_matches_reference_semantics():
    rng = np.random.default_rng(2)
    E = 200
    kk = rng.integers(0, 30, size=E)
    # unique (kk, jj) pairs like real patch graphs
    jj = np.zeros(E, dtype=int)
    for u in np.unique(kk):
        m = kk == u
        jj[m] = rng.choice(50, size=m.sum(), replace=False)
    ix_ref, jx_ref = naive_neighbors(kk, jj)
    ix, jx = segment.neighbors(jnp.asarray(kk), jnp.asarray(jj))
    np.testing.assert_array_equal(np.asarray(ix), ix_ref)
    np.testing.assert_array_equal(np.asarray(jx), jx_ref)


def test_neighbors_with_padding():
    kk = jnp.asarray([5, 5, 5, 99, 99])
    jj = jnp.asarray([2, 0, 1, 0, 0])
    valid = jnp.asarray([True, True, True, False, False])
    ix, jx = segment.neighbors(kk, jj, valid=valid)
    # sorted by jj within kk=5: order is e1(j0) e2(j1) e0(j2)
    np.testing.assert_array_equal(np.asarray(ix[:3]), [2, -1, 1])
    np.testing.assert_array_equal(np.asarray(jx[:3]), [-1, 2, 0])
    np.testing.assert_array_equal(np.asarray(ix[3:]), [-1, -1])


def test_compact_valid():
    valid = jnp.asarray([False, True, False, True, True])
    perm, n = segment.compact_valid(valid)
    assert int(n) == 3
    np.testing.assert_array_equal(np.asarray(perm), [1, 3, 4, 0, 2])


def test_jit_compatible():
    f = jax.jit(lambda k, j: segment.neighbors(k, j))
    kk = jnp.asarray([1, 1, 2])
    jj = jnp.asarray([4, 3, 1])
    ix, jx = f(kk, jj)
    np.testing.assert_array_equal(np.asarray(ix), [1, -1, -1])


def test_neighbors_from_sorted_matches_neighbors():
    """One-sort neighbor derivation: dead rows interleave freely in the
    okq_prefix order; the dead-skipping scan must still produce exactly
    `neighbors()` links for in-window rows (the round-3 shared-order
    path broke at interleaved dead rows; a cap-truncated table variant
    lost bootstrap links — both are documented dead ends)."""
    import numpy as np

    from wild_video_3d_reconstruction_tpu.ops.segment import (
        neighbors, neighbors_from_sorted)

    rng = np.random.default_rng(3)
    E, M_ = 900, 57
    kk = jnp.asarray(rng.integers(0, M_ + 9, E), jnp.int32)
    jj = jnp.asarray(np.sort(rng.integers(0, 40, E)), jnp.int32)
    valid = jnp.asarray(rng.random(E) < 0.6)

    okp = kk < M_
    key = jnp.where(okp, kk, jnp.int32(M_))
    order = jnp.argsort(key, stable=True)
    ix1, jx1 = neighbors_from_sorted(order, key[order], valid[order], M_)
    ix0, jx0 = neighbors(kk, jj, valid=valid & okp)
    m = np.asarray(valid & okp)
    np.testing.assert_array_equal(np.asarray(ix0)[m], np.asarray(ix1)[m])
    np.testing.assert_array_equal(np.asarray(jx0)[m], np.asarray(jx1)[m])
    # rows outside the window get no links (they are outside the BA
    # patch window, which covers every live edge in steady state)
    assert (np.asarray(ix1)[~m] == -1).all() or (~m).sum() == 0


def test_segment_softmax_sorted_matches_dense():
    import numpy as np

    from wild_video_3d_reconstruction_tpu.ops.segment import (
        segment_softmax_weighted_sum_dense,
        segment_softmax_weighted_sum_sorted)

    rng = np.random.default_rng(5)
    E, D, S = 700, 32, 50
    f = jnp.asarray(rng.normal(size=(E, D)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(E, D)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, S, E), jnp.int32)
    valid = jnp.asarray(rng.random(E) < 0.8)
    key = jnp.where(valid, ids, jnp.int32(S))
    order = jnp.argsort(key, stable=True)
    a = np.asarray(segment_softmax_weighted_sum_dense(f, g, ids, S,
                                                      valid=valid))
    b = np.asarray(segment_softmax_weighted_sum_sorted(f, g, ids, S, order,
                                                       valid=valid))
    m = np.asarray(valid)[:, None]
    assert np.abs(np.where(m, a - b, 0)).max() < 1e-4
