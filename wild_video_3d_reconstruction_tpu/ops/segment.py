"""Segment (scatter) operations with static segment counts.

TPU-native replacements for the reference's torch_scatter usage
(`dpvo/blocks.py:31-67` SoftAgg) and the CPU `fastba.neighbors` index builder
(`dpvo/fastba/ba.cpp:106-151`). Data-dependent `torch.unique` grouping is
replaced by bounded integer segment ids + a validity mask, so everything has
static shapes and stays inside jit (SURVEY.md section 7, "hard parts").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_softmax_weighted_sum_dense(f, g, seg_ids, num_segments,
                                       valid=None):
    """MXU formulation of SoftAgg's scatter-softmax-sum for bounded segment
    counts: scatters/gathers become two one-hot matmuls, which are ~10x
    faster than TPU scatter lowering at SLAM sizes (E~20k, S~1k).

    Numerically identical to the scatter version: the softmax is stabilized
    by a per-channel GLOBAL max (a constant shift within every segment).
    """
    dtype = f.dtype
    E = f.shape[0]
    g32 = g.astype(jnp.float32)
    if valid is None:
        valid = jnp.ones((E,), dtype=bool)

    onehot = (seg_ids[:, None] ==
              jnp.arange(num_segments)[None, :]) & valid[:, None]
    onehot = onehot.astype(jnp.float32)                  # [E, S]

    gmax = jnp.max(jnp.where(valid[:, None], g32, -jnp.inf), axis=0,
                   keepdims=True)
    gmax = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
    e = jnp.exp(g32 - gmax) * valid[:, None]             # [E, D]

    # r5 measured dead end: bundling numerator+denominator into one
    # [S, E] @ [E, 2D] contraction ran 0.4 ms SLOWER at SLAM sizes than
    # these four matmuls — XLA schedules the narrow pair better.
    denom = jnp.dot(onehot.T, e, preferred_element_type=jnp.float32)
    denom_e = jnp.dot(onehot, denom, preferred_element_type=jnp.float32)
    w = e / jnp.maximum(denom_e, 1e-12)

    y_seg = jnp.dot(onehot.T, f.astype(jnp.float32) * w,
                    preferred_element_type=jnp.float32)  # [S, D]
    y = jnp.dot(onehot, y_seg, preferred_element_type=jnp.float32)
    return y.astype(dtype)


def segment_softmax_weighted_sum(f, g, seg_ids, num_segments, valid=None):
    """softmax(g) within segments (per channel), weighted sum of f, expanded.

    f, g:     [E, D]
    seg_ids:  [E] int32 in [0, num_segments)
    valid:    [E] bool; invalid rows contribute nothing and read back zeros.
    returns:  [E, D] = segsum(f * softmax_seg(g))[seg_ids]

    This is exactly torch_scatter.scatter_softmax + scatter_sum as used by
    SoftAgg (`dpvo/blocks.py:40-48`), with the group relabeling
    (torch.unique return_inverse) replaced by caller-provided bounded ids.
    The softmax runs in fp32 for stability regardless of the input dtype.

    r5: stabilization uses the per-channel GLOBAL max (the same policy the
    dense one-hot path has always used — softmax is invariant to a common
    in-segment shift), and the numerator/denominator accumulate in ONE
    fused [E, 2D] segment_sum instead of two sums + a segment_max (the
    wide pass scatters the same bytes as the two sums; the saving is the
    dropped segment_max pass). Measured 4.96 -> 4.74 ms at the 55k tier —
    the TPU scatter-add itself is the floor (~38 GB/s effective), and
    sorted-cumsum / member-table / dense-one-hot alternatives all
    measured slower (8.9 / 18.8 / OOM at S=9601). The segment-max exact
    formulation survives as `segment_softmax_weighted_sum_exact`
    (equality-tested; the global shift only differs once a segment sits
    ~87 nats below the global max, where exp underflows for both).
    """
    dtype = f.dtype
    g32 = g.astype(jnp.float32)
    if valid is not None:
        g32 = jnp.where(valid[:, None], g32, -jnp.inf)
    gmax = jnp.max(g32, axis=0)
    gmax = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
    e = jnp.exp(g32 - gmax)
    if valid is not None:
        e = jnp.where(valid[:, None], e, 0.0)
    fe = jnp.concatenate([f.astype(jnp.float32) * e, e], axis=1)  # [E, 2D]
    acc = jax.ops.segment_sum(fe, seg_ids, num_segments=num_segments)
    acc_e = acc[seg_ids]                                          # [E, 2D]
    D = f.shape[1]
    y = acc_e[:, :D] / jnp.maximum(acc_e[:, D:], 1e-12)
    if valid is not None:
        y = jnp.where(valid[:, None], y, 0.0)
    return y.astype(dtype)


def segment_softmax_weighted_sum_exact(f, g, seg_ids, num_segments,
                                       valid=None):
    """Reference formulation with per-segment max stabilization (three
    scatter passes); kept as the numerical oracle for the fused path."""
    dtype = f.dtype
    g32 = g.astype(jnp.float32)
    if valid is not None:
        g32 = jnp.where(valid[:, None], g32, -jnp.inf)
    seg_max = jax.ops.segment_max(g32, seg_ids, num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    e = jnp.exp(g32 - seg_max[seg_ids])
    if valid is not None:
        e = jnp.where(valid[:, None], e, 0.0)
    denom = jax.ops.segment_sum(e, seg_ids, num_segments=num_segments)
    w = e / jnp.maximum(denom[seg_ids], 1e-12)
    y = jax.ops.segment_sum(f.astype(jnp.float32) * w, seg_ids,
                            num_segments=num_segments)
    return y[seg_ids].astype(dtype)


def segment_softmax_weighted_sum_table(f, g, table, seg_ids, valid):
    """SoftAgg's scatter-softmax-sum through a per-segment edge TABLE.

    table: [S, cap] edge ids (E = dummy), as built by
    `ba.gauss_newton._group_by_patch` — each segment's members gathered
    into a dense row. All reductions become axis-1 reductions over the
    gathered [S, cap, D] tensors: no TPU scatters, no [E, S] one-hot
    (the dense formulation materializes E x S fp32 — 8.5 GB at
    default-config sizes — and the scatter formulation lowers to slow
    TPU scatter-adds). Numerically the per-segment max stabilization of
    `segment_softmax_weighted_sum`.

    f, g: [E, D]; seg_ids: [E] (only used for the read-back gather;
    rows not present in the table read back zeros).
    """
    dtype = f.dtype
    E, D = f.shape
    S = table.shape[0]
    member = table < E                                    # [S, cap]
    t = jnp.clip(table, 0, E - 1)
    g32 = g.astype(jnp.float32)
    f32 = f.astype(jnp.float32)
    g_t = jnp.where(member[..., None], g32[t], -jnp.inf)  # [S, cap, D]
    m = jnp.max(g_t, axis=1)                              # [S, D]
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.where(member[..., None], jnp.exp(g_t - m[:, None]), 0.0)
    denom = jnp.maximum(e.sum(axis=1), 1e-12)             # [S, D]
    y_seg = jnp.einsum("scd,scd->sd", e, f32[t] *
                       member[..., None]) / denom         # [S, D]
    y_seg = jnp.concatenate([y_seg, jnp.zeros((1, D), jnp.float32)])
    sid = jnp.where(valid & (seg_ids < S), seg_ids, S)
    return y_seg[sid].astype(dtype)


def segment_softmax_weighted_sum_runsum(f, g, seg_ids, num_segments, order,
                                        valid=None):
    """SoftAgg reduction as banded MXU run-sums over a precomputed sort.

    order: [E] stable argsort by where(member, seg_id, num_segments) —
    the okq_prefix BA table order `slam.steps.update_op` already holds
    (no extra sort). Valid rows of every segment are contiguous runs
    under it, bounded by the per-patch edge cap (< ops.pallas_segsum.OV
    rows), so the scatter-add becomes one banded one-hot matmul per row
    block (`run_segment_sum_sorted`) whose output is simultaneously the
    segment total and the per-row expansion. Costs two [E, 2D] gathers
    (sort + unsort) plus the banded matmul — measured vs the 5-6 ms
    scatter floor at default-config tiers on v5e (r5).

    Numerically the per-channel GLOBAL max stabilization of
    `segment_softmax_weighted_sum` with fp32 accumulation (MXU,
    preferred_element_type=fp32) — pinned equal in tests.
    """
    dtype = f.dtype
    E, D = f.shape
    if valid is None:
        valid = jnp.ones((E,), bool)
    g32 = g.astype(jnp.float32)
    g32 = jnp.where(valid[:, None], g32, -jnp.inf)
    gmax = jnp.max(g32, axis=0)
    gmax = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
    e = jnp.where(valid[:, None], jnp.exp(g32 - gmax), 0.0)
    fe = jnp.concatenate([f.astype(jnp.float32) * e, e], axis=1)  # [E, 2D]

    key = jnp.where(valid & (seg_ids < num_segments), seg_ids,
                    num_segments).astype(jnp.int32)
    from .pallas_segsum import run_segment_sum_sorted
    acc_sorted = run_segment_sum_sorted(fe[order], key[order])
    inv = jnp.zeros((E,), jnp.int32).at[order].set(
        jnp.arange(E, dtype=jnp.int32))
    acc_e = acc_sorted[inv]                                       # [E, 2D]
    y = acc_e[:, :D] / jnp.maximum(acc_e[:, D:], 1e-12)
    y = jnp.where(valid[:, None], y, 0.0)
    return y.astype(dtype)


def neighbors(kk, jj, valid=None, pad_value=-1, order=None):
    """Previous/next edge indices within each patch group, ordered by jj.

    For every edge e, find the edge with the same patch id kk[e] whose target
    frame jj immediately precedes / follows jj[e] (insertion order breaking
    ties). Returns (ix, jx) of shape [E] with -1 where no neighbor exists.
    Semantics match `fastba.neighbors` (`dpvo/fastba/ba.cpp:106-151`), which
    feeds the update operator's temporal message passing (`dpvo/net.py:81-86`).

    Implementation: one stable sort over the composite key (valid, kk, jj),
    then neighbor links between consecutive sorted entries that share kk.
    Invalid (padded) edges sort to the end and receive -1 links.

    order: optional precomputed stable ordering by (invalid, kk) — valid
    ONLY when each patch's edges already appear in ascending-jj table
    order. The SLAM edge table guarantees this by construction (edges are
    appended target-ascending; compaction and eviction are stable), letting
    `slam.steps` share ONE argsort between this and the BA patch grouping
    (TPU sorts cost ~10 ms per 221k rows; see scripts/sort_micro.py).
    """
    E = kk.shape[0]
    kk = kk.astype(jnp.int32)
    jj = jj.astype(jnp.int32)
    if valid is None:
        valid = jnp.ones((E,), dtype=bool)

    if order is None:
        # lexicographic stable sort by (invalid, kk, jj) via two cascaded
        # stable argsorts (the invalid flag folds into the kk key; a single
        # composite key would overflow int32 at full buffer sizes)
        kk_key = jnp.where(valid, kk, jnp.int32(1 << 30))
        order = jnp.argsort(jj, stable=True)
        order = order[jnp.argsort(kk_key[order], stable=True)]
    kk_s = kk[order]
    valid_s = valid[order]

    idx = jnp.arange(E)
    same_prev = (idx > 0) & (kk_s == jnp.roll(kk_s, 1)) & valid_s & \
        jnp.roll(valid_s, 1)
    same_next = (idx < E - 1) & (kk_s == jnp.roll(kk_s, -1)) & valid_s & \
        jnp.roll(valid_s, -1)

    prev_sorted = jnp.where(same_prev, jnp.roll(order, 1), pad_value)
    next_sorted = jnp.where(same_next, jnp.roll(order, -1), pad_value)

    ix = jnp.zeros((E,), dtype=jnp.int32).at[order].set(
        prev_sorted.astype(jnp.int32))
    jx = jnp.zeros((E,), dtype=jnp.int32).at[order].set(
        next_sorted.astype(jnp.int32))
    return ix, jx


def compact_valid(valid):
    """Stable permutation moving valid entries to the front.

    Returns (perm, n_valid): applying arrays[perm] packs live edges first
    while preserving creation order — the fixed-shape replacement for the
    reference's boolean-mask compaction (`dpvo/dpvo.py:349-364`).

    Sort-free: a stable two-way partition is rank arithmetic — two cumsums
    and one int32 scatter instead of an O(E log^2 E) bitonic argsort.
    """
    E = valid.shape[0]
    vi = valid.astype(jnp.int32)
    c = jnp.cumsum(vi)
    n_valid = c[-1]
    pos = jnp.where(valid, c - 1, n_valid + jnp.cumsum(1 - vi) - 1)
    perm = jnp.zeros((E,), jnp.int32).at[pos].set(
        jnp.arange(E, dtype=jnp.int32))
    return perm, n_valid


def neighbors_from_sorted(order, key_s, valid_s, key_max, pad_value=-1):
    """Neighbor links from ONE precomputed stable sort, skipping dead rows.

    order: [E] stable argsort of key = where(member, patch_id, key_max);
    key_s = key[order]; valid_s = valid[order]. Rows sharing a patch id
    are contiguous and in original-index (== ascending-jj) order; dead
    rows interleave freely — the chain scans PAST them (a plain roll(1)
    link, as `neighbors(order=...)` uses, breaks at every interleaved
    dead row, which is why the round-3 shared-order path required a
    valid-masked sort key; this keeps exact `neighbors()` semantics from
    the BA table's own okq_prefix sort, saving the second argsort).

    Returns (ix, jx) like `neighbors` (unsorted [E] layout).
    """
    E = order.shape[0]
    idx = jnp.arange(E)
    use = valid_s & (key_s < key_max)
    # previous USED row index (exclusive scan), validated same-patch
    pv = jax.lax.cummax(jnp.where(use, idx, -1))
    pv_excl = jnp.concatenate([jnp.full((1,), -1, pv.dtype), pv[:-1]])
    pvc = jnp.clip(pv_excl, 0, E - 1)
    ok_prev = use & (pv_excl >= 0) & (key_s[pvc] == key_s)
    prev_sorted = jnp.where(ok_prev, order[pvc], pad_value)
    # next USED row: reverse of the same scan
    rn = jax.lax.cummin(jnp.flip(jnp.where(use, idx, E)))
    nx = jnp.flip(rn)
    nx_excl = jnp.concatenate([nx[1:], jnp.full((1,), E, nx.dtype)])
    nxc = jnp.clip(nx_excl, 0, E - 1)
    ok_next = use & (nx_excl < E) & (key_s[nxc] == key_s)
    next_sorted = jnp.where(ok_next, order[nxc], pad_value)

    ix = jnp.zeros((E,), jnp.int32).at[order].set(
        prev_sorted.astype(jnp.int32))
    jx = jnp.zeros((E,), jnp.int32).at[order].set(
        next_sorted.astype(jnp.int32))
    return ix, jx


def segment_softmax_weighted_sum_sorted(f, g, seg_ids, num_segments, order,
                                        valid=None):
    """SoftAgg reduction via a precomputed segment sort: cumsum + boundary
    differences instead of TPU scatter-adds.

    order: [E] stable argsort of key = where(member, seg_id, num_segments)
    — exactly the okq_prefix table sort `slam.steps.update_op` already
    holds, so the formulation adds NO extra sort. Segment sums become
    (a) one cumsum over the sorted rows and (b) two row gathers at the
    searchsorted boundaries; the per-edge read-back stays a gather.
    Stabilized by the per-channel GLOBAL max like
    `segment_softmax_weighted_sum_dense` (a constant shift within every
    segment — numerically identical softmax).

    MEASURED DEAD END for the SLAM hot path (kept as a tested
    primitive): at [55k, 384] x 9600 segments on v5e this runs 8.9-9.3
    ms vs 4.8 ms for the scatter formulation — the [E, 384] fp32
    cumsums are log-depth scans that cost more than XLA's scatter-adds
    at this shape (scripts/gru_micro.py). Do not wire it into
    update_forward without new evidence.
    """
    dtype = f.dtype
    E, D = f.shape
    if valid is None:
        valid = jnp.ones((E,), bool)
    g32 = g.astype(jnp.float32)
    gmax = jnp.max(jnp.where(valid[:, None], g32, -jnp.inf), axis=0,
                   keepdims=True)
    gmax = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
    e = jnp.exp(g32 - gmax) * valid[:, None]              # [E, D]

    key = jnp.where(valid & (seg_ids < num_segments), seg_ids,
                    num_segments).astype(jnp.int32)
    key_s = key[order]
    bounds = jnp.searchsorted(key_s, jnp.arange(num_segments + 1))

    def seg_sum_sorted(x):
        xs = x[order]
        c = jnp.concatenate([jnp.zeros((1, D), jnp.float32),
                             jnp.cumsum(xs.astype(jnp.float32), axis=0)])
        return c[bounds[1:]] - c[bounds[:-1]]             # [S, D]

    denom = seg_sum_sorted(e)
    sid = jnp.clip(key, 0, num_segments - 1)
    w = e / jnp.maximum(denom[sid], 1e-12)
    y_seg = seg_sum_sorted(f.astype(jnp.float32) * w)
    y = jnp.where(valid[:, None], y_seg[sid], 0.0)
    return y.astype(dtype)
