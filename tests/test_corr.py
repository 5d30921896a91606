"""Correlation lookup: chunked XLA implementation vs naive oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from wild_video_3d_reconstruction_tpu.ops import corr as corr_ops
from wild_video_3d_reconstruction_tpu.ops import patchify as patchify_ops


def make_inputs(key, E=17, Ek=24, F=3, H=12, W=16, C=8, P=3):
    k = jax.random.split(key, 4)
    gmap = jax.random.normal(k[0], (Ek, C, P, P))
    fmap = jax.random.normal(k[1], (F, H, W, C))
    coords = jnp.stack([
        jax.random.uniform(k[2], (E, P, P), minval=-2.0, maxval=W + 2.0),
        jax.random.uniform(k[3], (E, P, P), minval=-2.0, maxval=H + 2.0),
    ], axis=-1)
    kk = jax.random.randint(jax.random.fold_in(key, 9), (E,), 0, Ek)
    jj = jax.random.randint(jax.random.fold_in(key, 10), (E,), 0, F)
    return gmap, fmap, coords, kk, jj


def test_corr_matches_naive():
    gmap, fmap, coords, kk, jj = make_inputs(jax.random.PRNGKey(0))
    ref = corr_ops.patch_corr_naive(gmap, fmap, coords, kk, jj, radius=2)
    out = corr_ops.patch_corr_level(gmap, fmap, coords, kk, jj, radius=2)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_corr_chunked_equals_unchunked():
    gmap, fmap, coords, kk, jj = make_inputs(jax.random.PRNGKey(1), E=53)
    full = corr_ops.patch_corr_level(gmap, fmap, coords, kk, jj, radius=3)
    chunked = corr_ops.patch_corr_level(gmap, fmap, coords, kk, jj, radius=3,
                                        chunk=16)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               atol=1e-5)


def test_corr_valid_mask_zeroes():
    gmap, fmap, coords, kk, jj = make_inputs(jax.random.PRNGKey(2), E=8)
    valid = jnp.asarray([1, 1, 0, 1, 0, 1, 1, 0], dtype=jnp.float32)
    out = corr_ops.patch_corr_level(gmap, fmap, coords, kk, jj, valid=valid)
    assert np.allclose(np.asarray(out[2]), 0)
    assert np.allclose(np.asarray(out[4]), 0)


def test_corr_pyramid_layout():
    # the flattened feature must interleave levels last:
    # index = (((dx*d + dy)*P + pi)*P + pj)*L + l
    gmap, fmap, coords, kk, jj = make_inputs(jax.random.PRNGKey(3), E=5,
                                             H=16, W=16)
    fmap2 = patchify_ops.avg_pool2d(fmap, 4)
    out = corr_ops.patch_corr_pyramid(gmap, (fmap, fmap2), coords, kk, jj,
                                      radius=2, levels=(1, 4))
    d, P, L = 5, 3, 2
    assert out.shape == (5, d * d * P * P * L)
    lvl0 = corr_ops.patch_corr_level(gmap, fmap, coords, kk, jj, radius=2)
    lvl1 = corr_ops.patch_corr_level(gmap, fmap2, coords / 4, kk, jj, radius=2)
    re = np.asarray(out).reshape(5, d, d, P, P, L)
    np.testing.assert_allclose(re[..., 0], np.asarray(lvl0), atol=1e-5)
    np.testing.assert_allclose(re[..., 1], np.asarray(lvl1), atol=1e-5)


def test_patchify_integer_coords_exact():
    key = jax.random.PRNGKey(4)
    fmap = jax.random.normal(key, (10, 14, 6))
    coords = jnp.asarray([[3.0, 4.0], [7.0, 2.0]])
    out = patchify_ops.patchify(fmap, coords, radius=1)
    # at integer coords the bilinear blend reduces to an exact 3x3 window
    expect = np.moveaxis(np.asarray(fmap)[3:6, 2:5], -1, 0)
    np.testing.assert_allclose(np.asarray(out[0]),
                               np.moveaxis(np.asarray(fmap)[3:6, 2:5], -1, 0),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]),
                               np.moveaxis(np.asarray(fmap)[1:4, 6:9], -1, 0),
                               atol=1e-6)


def test_patchify_bilinear_midpoint():
    fmap = jnp.arange(24.0).reshape(4, 6, 1)
    out = patchify_ops.patchify(fmap, jnp.asarray([[2.5, 1.5]]), radius=0)
    expect = np.mean([np.asarray(fmap)[1, 2], np.asarray(fmap)[1, 3],
                      np.asarray(fmap)[2, 2], np.asarray(fmap)[2, 3]])
    np.testing.assert_allclose(float(out[0, 0, 0, 0]), expect, atol=1e-6)


def test_patchify_out_of_bounds_zero():
    fmap = jnp.ones((8, 8, 2))
    out = patchify_ops.patchify(fmap, jnp.asarray([[-5.0, -5.0]]), radius=1)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_oracle_matches_cuda_kernel_transcription():
    """`patch_corr_level` vs a literal numpy transcription of the CUDA
    forward kernel + host bilinear blend
    (`correlation_kernel.cu:83-136,221-232`): integer-grid sampling at
    floor(coord)+off-R with zero outside bounds, then 4-shift blend with
    the fractional parts, output layout [dx_win, dy_win, pi, pj]."""
    rng = np.random.default_rng(7)
    F, H, W, C = 3, 20, 28, 8
    Ek, P, R = 6, 3, 3
    E = 10
    gmap = rng.normal(size=(Ek, C, P, P)).astype(np.float32)
    fmap = rng.normal(size=(F, H, W, C)).astype(np.float32)
    kk = rng.integers(0, Ek, E)
    jj = rng.integers(0, F, E)
    coords = rng.uniform(-2, max(H, W) + 2, size=(E, P, P, 2)
                         ).astype(np.float32)

    D = 2 * R + 2
    corr = np.zeros((E, P, P, D, D), np.float32)   # [e, i0, j0, iy, jx]
    for e in range(E):
        for i0 in range(P):
            for j0 in range(P):
                x, y = coords[e, i0, j0]
                f1 = gmap[kk[e], :, i0, j0]
                for iy in range(D):
                    for jx in range(D):
                        i1 = int(np.floor(y)) + (iy - R)
                        j1 = int(np.floor(x)) + (jx - R)
                        if 0 <= i1 < H and 0 <= j1 < W:
                            corr[e, i0, j0, iy, jx] = \
                                f1 @ fmap[jj[e], i1, j1]
    dx = (coords[..., 0] - np.floor(coords[..., 0]))[..., None, None]
    dy = (coords[..., 1] - np.floor(coords[..., 1]))[..., None, None]
    d = D - 1
    blend = ((1 - dx) * (1 - dy) * corr[..., :d, :d]
             + dx * (1 - dy) * corr[..., :d, 1:]
             + (1 - dx) * dy * corr[..., 1:, :d]
             + dx * dy * corr[..., 1:, 1:])        # [e, i0, j0, y, x]
    # kernel output permute (0,1,3,2,4,5): [e, x_win, y_win, i0, j0]
    ref = blend.transpose(0, 4, 3, 1, 2)

    out = np.asarray(corr_ops.patch_corr_level(
        jnp.asarray(gmap), jnp.asarray(fmap), jnp.asarray(coords),
        jnp.asarray(kk), jnp.asarray(jj), radius=R))
    # ours returns [E, 2R+1, 2R+1, P, P] in the same (x, y, pi, pj) order
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_patchify_matches_cuda_transcription():
    """`ops.patchify.patchify` vs a literal transcription of the altcorr
    patchify semantics (`correlation.py:51-68`): (2R+2)-window extract at
    floor(coord)+off-R with zero padding, then the 4-shift bilinear
    blend x00..x11."""
    rng = np.random.default_rng(9)
    H, W, C, M, R = 18, 24, 5, 7, 1
    fmap = rng.normal(size=(H, W, C)).astype(np.float32)
    coords = rng.uniform(-1, max(H, W), size=(M, 2)).astype(np.float32)

    D = 2 * R + 2
    win = np.zeros((M, C, D, D), np.float32)
    for m in range(M):
        x0, y0 = np.floor(coords[m]).astype(int)
        for iy in range(D):
            for jx in range(D):
                yy, xx = y0 + iy - R, x0 + jx - R
                if 0 <= yy < H and 0 <= xx < W:
                    win[m, :, iy, jx] = fmap[yy, xx]
    dx = (coords[:, 0] - np.floor(coords[:, 0]))[:, None, None, None]
    dy = (coords[:, 1] - np.floor(coords[:, 1]))[:, None, None, None]
    d = D - 1
    ref = ((1 - dy) * (1 - dx) * win[..., :d, :d]
           + (1 - dy) * dx * win[..., :d, 1:]
           + dy * (1 - dx) * win[..., 1:, :d]
           + dy * dx * win[..., 1:, 1:])

    out = np.asarray(patchify_ops.patchify(jnp.asarray(fmap),
                                           jnp.asarray(coords), radius=R))
    np.testing.assert_allclose(out, ref, atol=1e-5)
