"""Pallas correlation kernel vs the XLA oracle (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wild_video_3d_reconstruction_tpu.ops import corr as corr_ops
from wild_video_3d_reconstruction_tpu.ops import pallas_corr
from wild_video_3d_reconstruction_tpu.ops.patchify import avg_pool2d


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # run the kernel in interpreter mode on CPU
    orig = pallas_corr.pl.pallas_call
    monkeypatch.setattr(pallas_corr.pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    yield


def make_inputs(key, E=37, F=4, H=32, W=48, C=128, P=3, spread=2.0):
    ks = jax.random.split(key, 5)
    gmap = jax.random.normal(ks[0], (F * 8, C, P, P), jnp.float32)
    fmap = jax.random.normal(ks[1], (F, H, W, C), jnp.float32)
    fmap2 = avg_pool2d(fmap, 4)
    centers = jnp.stack([
        jax.random.uniform(ks[2], (E,), minval=2.0, maxval=W - 3.0),
        jax.random.uniform(ks[3], (E,), minval=2.0, maxval=H - 3.0),
    ], axis=-1)
    # bounded patch spread (real reprojected 3x3 patches span a few px;
    # the kernel's 16x16 region covers spreads up to 8 px)
    offs = jnp.clip(spread * jax.random.normal(ks[4], (E, P, P, 2)),
                    -3.5, 3.5)
    coords = centers[:, None, None, :] + offs
    kk = jax.random.randint(jax.random.fold_in(key, 8), (E,), 0, F * 8)
    jj = jax.random.randint(jax.random.fold_in(key, 9), (E,), 0, F)
    return gmap, (fmap, fmap2), coords, kk, jj


def test_pallas_matches_oracle():
    gmap, pyr, coords, kk, jj = make_inputs(jax.random.PRNGKey(0))
    ref = corr_ops.patch_corr_pyramid(gmap, pyr, coords, kk, jj, radius=3)
    out = pallas_corr.patch_corr_pyramid_pallas(gmap, pyr, coords, kk, jj)
    # bf16 kernel inputs: compare with a loose-but-meaningful tolerance
    ref = np.asarray(ref)
    out = np.asarray(out)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < 2e-2, \
        np.abs(out - ref).max() / scale


def test_pallas_valid_mask():
    gmap, pyr, coords, kk, jj = make_inputs(jax.random.PRNGKey(1), E=16)
    valid = jnp.asarray([1, 0] * 8, jnp.float32)
    out = pallas_corr.patch_corr_pyramid_pallas(gmap, pyr, coords, kk, jj,
                                                valid=valid)
    out = np.asarray(out).reshape(16, -1)
    assert np.allclose(out[1], 0)
    assert np.abs(out[0]).max() > 0


def test_pallas_fused_matches_oracle():
    """v2 kernel (in-kernel extraction + blend) vs the XLA oracle."""
    gmap, pyr, coords, kk, jj = make_inputs(jax.random.PRNGKey(3))
    ref = np.asarray(corr_ops.patch_corr_pyramid(gmap, pyr, coords, kk, jj,
                                                 radius=3))
    out = np.asarray(pallas_corr.patch_corr_pyramid_pallas(
        gmap, pyr, coords, kk, jj, fused=True))
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < 2e-2, \
        np.abs(out - ref).max() / scale


def test_pallas_fused_matches_v1():
    """The two kernel paths share bucketing/region logic: identical inputs
    must agree to bf16 blend rounding (tighter than the oracle bound)."""
    gmap, pyr, coords, kk, jj = make_inputs(jax.random.PRNGKey(4), E=21)
    v1 = np.asarray(pallas_corr.patch_corr_pyramid_pallas(
        gmap, pyr, coords, kk, jj))
    v2 = np.asarray(pallas_corr.patch_corr_pyramid_pallas(
        gmap, pyr, coords, kk, jj, fused=True))
    scale = np.abs(v1).max() + 1e-6
    assert np.abs(v2 - v1).max() / scale < 5e-3, \
        np.abs(v2 - v1).max() / scale


def test_pallas_fused_valid_mask():
    gmap, pyr, coords, kk, jj = make_inputs(jax.random.PRNGKey(5), E=16)
    valid = jnp.asarray([1, 0] * 8, jnp.float32)
    out = pallas_corr.patch_corr_pyramid_pallas(gmap, pyr, coords, kk, jj,
                                                valid=valid, fused=True)
    out = np.asarray(out).reshape(16, -1)
    assert np.allclose(out[1], 0)
    assert np.abs(out[0]).max() > 0


def test_pallas_large_block_matches_oracle(monkeypatch):
    """The EB_LARGE (128-edge-block) path used by big edge tables — forced
    here with a small table by lowering the switch — must match the oracle
    exactly like the EB=32 path (default config compiles only via this
    path: the Mosaic SMEM prefetch table scales with grid size)."""
    monkeypatch.setattr(pallas_corr, "EB_SWITCH", 1)
    gmap, pyr, coords, kk, jj = make_inputs(jax.random.PRNGKey(6))
    ref = np.asarray(corr_ops.patch_corr_pyramid(gmap, pyr, coords, kk, jj,
                                                 radius=3))
    out = np.asarray(pallas_corr.patch_corr_pyramid_pallas(
        gmap, pyr, coords, kk, jj))
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < 2e-2, \
        np.abs(out - ref).max() / scale


def test_pallas_out_of_bounds_windows():
    # coords near/over the image border: padded zeros must reproduce the
    # oracle's out-of-bounds semantics
    gmap, pyr, coords, kk, jj = make_inputs(jax.random.PRNGKey(2), E=12)
    coords = coords.at[:4].add(-6.0)      # push some windows off the edge
    coords = coords.at[4:8].add(+6.0)
    ref = np.asarray(corr_ops.patch_corr_pyramid(gmap, pyr, coords, kk, jj,
                                                 radius=3))
    out = np.asarray(pallas_corr.patch_corr_pyramid_pallas(
        gmap, pyr, coords, kk, jj))
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < 2e-2


def test_bucketing_roundtrip():
    jj = jnp.asarray([3, 1, 1, 0, 3, 3, 1], jnp.int32)
    E = 7
    n_slots = 6 * pallas_corr.EB
    slot_edge, slot_of_edge, block_meta = pallas_corr._bucket_by_frame(
        jj, 4, n_slots)
    slot_edge = np.asarray(slot_edge)
    slot_of_edge = np.asarray(slot_of_edge)
    # every edge's slot points back at it
    for e in range(E):
        assert slot_edge[slot_of_edge[e]] == e
    # slots within one block share a frame; a block holding a live edge is
    # its own source (meta[b] = (frame, src_block), src == b <=> live)
    meta = np.asarray(block_meta)
    for e in range(E):
        b = slot_of_edge[e] // pallas_corr.EB
        assert meta[b, 0] == int(jj[e])
        assert meta[b, 1] == b
    # dead blocks alias an earlier (or clamped-first) block
    live = {slot_of_edge[e] // pallas_corr.EB for e in range(E)}
    for b in range(len(meta)):
        if b not in live:
            assert meta[b, 1] <= b
            assert meta[b, 1] in live or meta[b, 1] == 0


def test_bucketing_invalid_tail():
    # invalid edges must route to the tail group and their blocks be dead
    jj = jnp.asarray([2, 0, 1, 2, 1, 0], jnp.int32)
    valid = jnp.asarray([True, False, True, True, False, True])
    n_slots = 6 * pallas_corr.EB
    slot_edge, slot_of_edge, block_meta = pallas_corr._bucket_by_frame(
        jj, 3, n_slots, valid=valid)
    slot_edge, slot_of_edge = np.asarray(slot_edge), np.asarray(slot_of_edge)
    meta = np.asarray(block_meta)
    v = np.asarray(valid)
    for e in range(6):
        b = slot_of_edge[e] // pallas_corr.EB
        if v[e]:
            assert meta[b, 1] == b, e          # live block
        # invalid edges sort after every valid edge
        if not v[e]:
            assert all(slot_of_edge[e] > slot_of_edge[o]
                       for o in range(6) if v[o])


def test_pallas_x16_matches_oracle():
    """v4 exact-origin 16-column variant: parity on bounded-spread coords."""
    gmap, pyr, coords, kk, jj = make_inputs(jax.random.PRNGKey(5))
    ref = corr_ops.patch_corr_pyramid(gmap, pyr, coords, kk, jj, radius=3)
    out = pallas_corr.patch_corr_pyramid_pallas(gmap, pyr, coords, kk, jj,
                                                variant="x16")
    ref = np.asarray(ref)
    out = np.asarray(out)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < 2e-2, \
        np.abs(out - ref).max() / scale


def test_pallas_x16_hybrid_covers_clipped():
    """Edges whose spread exceeds the x16 region (but fits x32) are
    repaired by the hybrid fallback instead of zeroed, and the clip count
    is reported."""
    key = jax.random.PRNGKey(7)
    gmap, pyr, coords, kk, jj = make_inputs(key, E=24, spread=0.5)
    # blow up the spread of half the edges beyond 8 px at level 1 by
    # widening their patch offsets (centers stay inside the image)
    wide = (jnp.arange(24) % 2 == 0)
    offs_wide = jnp.asarray(
        np.array([[-5.0, -5.0], [0.0, 0.0], [5.0, 5.0]]))
    coords_w = coords.at[:, :, :, 0].add(
        jnp.where(wide[:, None, None], offs_wide[None, :, 1][:, :, None],
                  0.0))
    coords_w = coords_w.at[:, :, :, 1].add(
        jnp.where(wide[:, None, None], offs_wide[None, :, 0][:, :, None],
                  0.0))

    x32, n32 = pallas_corr.patch_corr_pyramid_pallas(
        gmap, pyr, coords_w, kk, jj, variant="x32", return_clip_count=True)
    x16, n16 = pallas_corr.patch_corr_pyramid_pallas(
        gmap, pyr, coords_w, kk, jj, variant="x16", return_clip_count=True)
    hyb, nh = pallas_corr.patch_corr_pyramid_pallas(
        gmap, pyr, coords_w, kk, jj, variant="x16", hybrid_budget=32,
        return_clip_count=True)
    assert int(n16) > 0                      # x16 clips the widened edges
    assert int(nh) == int(n16)
    x32, x16, hyb = map(np.asarray, (x32, x16, hyb))
    scale = np.abs(x32).max() + 1e-6
    # without the fallback the widened edges lose energy vs x32
    assert np.abs(x16 - x32).max() / scale > 5e-2
    # with it, every edge matches the x32 geometry (fallback edges are
    # recomputed through it; unclipped edges already agreed)
    assert np.abs(hyb - x32).max() / scale < 2e-2, \
        np.abs(hyb - x32).max() / scale

def test_pallas_x16_unaligned_width():
    """Regression (r5): W=120 gives an unpadded Wp=136 (not %16); right-edge
    regions then carry phase = ox - ox16 up to 24, past the kernel's
    rotate-carve bound of 16, and pltpu.roll wraps in garbage columns that
    still pass the fits mask. The level pads Wp up to a multiple of 16."""
    key = jax.random.PRNGKey(11)
    gmap, pyr, coords, kk, jj = make_inputs(key, E=48, H=64, W=120,
                                            spread=0.5)
    # park every edge center hard against the right image edge, where the
    # clipped region origin exercises the maximal phase
    fmap, _ = pyr
    W = fmap.shape[2]
    x_edge = jax.random.uniform(jax.random.fold_in(key, 3), (48,),
                                minval=W - 9.0, maxval=W - 3.5)
    coords = coords.at[..., 0].add(
        (x_edge - coords[:, 1, 1, 0])[:, None, None])
    ref = corr_ops.patch_corr_pyramid(gmap, pyr, coords, kk, jj, radius=3)
    out = pallas_corr.patch_corr_pyramid_pallas(gmap, pyr, coords, kk, jj,
                                                variant="x16")
    ref = np.asarray(ref)
    out = np.asarray(out)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / scale < 2e-2, \
        np.abs(out - ref).max() / scale

def test_pallas_x16_fused_matches_oracle():
    """v5 fused x16 (in-kernel extraction + blend): parity on
    bounded-spread coords, including the unaligned-width geometry."""
    for seed, kw in ((13, {}), (17, dict(H=64, W=120))):
        gmap, pyr, coords, kk, jj = make_inputs(jax.random.PRNGKey(seed),
                                                **kw)
        ref = corr_ops.patch_corr_pyramid(gmap, pyr, coords, kk, jj,
                                          radius=3)
        out = pallas_corr.patch_corr_pyramid_pallas(
            gmap, pyr, coords, kk, jj, variant="x16", fused=True)
        ref = np.asarray(ref)
        out = np.asarray(out)
        scale = np.abs(ref).max() + 1e-6
        assert np.abs(out - ref).max() / scale < 2e-2, \
            (kw, np.abs(out - ref).max() / scale)
