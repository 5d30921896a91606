"""Banded MXU run-sum SoftAgg vs the scatter oracle (interpret mode).

`segment_softmax_weighted_sum_runsum` routes the kk-SoftAgg through
`ops.pallas_segsum.run_segment_sum_sorted` using a precomputed segment
sort; this pins exact agreement with the scatter formulation on
SLAM-shaped data (bounded runs, interleaved invalid rows, segments
straddling block boundaries).
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wild_video_3d_reconstruction_tpu.ops import pallas_segsum
from wild_video_3d_reconstruction_tpu.ops.segment import (
    segment_softmax_weighted_sum, segment_softmax_weighted_sum_runsum)


@pytest.fixture(autouse=True)
def _interpret_mode(request, monkeypatch):
    if "device_kernel" in request.keywords:
        yield                       # compiled-kernel test: no interpret
        return
    orig = pallas_segsum.pl.pallas_call
    monkeypatch.setattr(pallas_segsum.pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    yield


def make_case(seed, E=1024, D=32, S=300, max_run=20, invalid_frac=0.15):
    """Segment ids drawn as bounded runs; some rows invalid."""
    rng = np.random.default_rng(seed)
    seg = np.empty(E, np.int32)
    i = 0
    s = 0
    while i < E:
        n = int(rng.integers(1, max_run))
        seg[i:i + n] = min(s, S - 1)
        i += n
        s += 1
    perm = rng.permutation(E)           # edge order is arbitrary
    seg = seg[perm]
    valid = rng.random(E) >= invalid_frac
    f = rng.normal(size=(E, D)).astype(np.float32)
    g = rng.normal(size=(E, D)).astype(np.float32)
    # the shared sort: stable by where(valid, seg, S)
    key = np.where(valid, seg, S)
    order = np.argsort(key, kind="stable").astype(np.int32)
    return (jnp.asarray(f), jnp.asarray(g), jnp.asarray(seg), S,
            jnp.asarray(order), jnp.asarray(valid))


@pytest.mark.parametrize("seed", [0, 1])
def test_runsum_matches_scatter(seed):
    f, g, seg, S, order, valid = make_case(seed)
    ref = segment_softmax_weighted_sum(f, g, seg, S + 1, valid=valid)
    got = segment_softmax_weighted_sum_runsum(f, g, seg, S + 1, order,
                                              valid=valid)
    ref = np.where(np.asarray(valid)[:, None], np.asarray(ref), 0.0)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-6)


@pytest.mark.device_kernel
@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="compiled-kernel check needs a TPU backend")
def test_runsum_device_compiles_and_matches():
    """Compiled (non-interpret) kernel on the device backend.

    Pins two things the interpret-mode tests cannot: (a) Mosaic
    legalization of the kernel (a toolchain update rejected the former
    bool-operand vector select, r5), and (b) the device accuracy floor —
    the one-hot matmul rounds operands to bf16 on current toolchains, so
    the tolerance here is relative ~2^-8, not exact."""
    rng = np.random.default_rng(0)
    RB = pallas_segsum.RB
    E, D = 2 * RB, 384
    lens = rng.integers(1, 28, size=E)
    ids = np.repeat(np.arange(len(lens)), lens)[:E]
    ids.sort()
    fes = rng.normal(size=(E, D)).astype(np.float32)
    out = np.asarray(jax.jit(pallas_segsum.run_segment_sum_sorted)(
        jnp.asarray(fes), jnp.asarray(ids)))
    ref = np.asarray(jax.ops.segment_sum(
        jnp.asarray(fes), jnp.asarray(ids),
        num_segments=int(ids.max()) + 1))[ids]
    scale = np.maximum(np.abs(ref), 1.0)
    np.testing.assert_allclose(out / scale, ref / scale, atol=2e-2)


def test_runsum_boundary_runs():
    """A run straddling the RB block boundary must sum across it."""
    E, D = 2 * pallas_segsum.RB, 8
    rng = np.random.default_rng(3)
    seg = np.arange(E, dtype=np.int32) // 24      # runs of 24 rows
    f = rng.normal(size=(E, D)).astype(np.float32)
    g = rng.normal(size=(E, D)).astype(np.float32)
    valid = np.ones(E, bool)
    S = int(seg.max()) + 1
    order = jnp.arange(E, dtype=jnp.int32)        # already sorted
    ref = segment_softmax_weighted_sum(jnp.asarray(f), jnp.asarray(g),
                                       jnp.asarray(seg), S,
                                       valid=jnp.asarray(valid))
    got = segment_softmax_weighted_sum_runsum(
        jnp.asarray(f), jnp.asarray(g), jnp.asarray(seg), S, order,
        valid=jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
