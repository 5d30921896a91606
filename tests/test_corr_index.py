"""DROID RAFT-lookup ops vs a literal numpy transcription of
`src/correlation_kernels.cu:20-70` (corr_index_forward_kernel)."""

import jax.numpy as jnp
import numpy as np

from wild_video_3d_reconstruction_tpu.ops.dense import (corr_index,
                                                        corr_lookup_pyramid,
                                                        corr_pyramid,
                                                        corr_volume)


def _oracle_corr_index(volume, coords, r):
    """Direct transcription: scatter-style accumulation into the four
    neighboring output cells, zero outside bounds."""
    N, h1, w1, h2, w2 = volume.shape
    rd = 2 * r + 1
    out = np.zeros((N, rd, rd, h1, w1), np.float32)
    for n in range(N):
        for y in range(h1):
            for x in range(w1):
                x0 = coords[n, 0, y, x]
                y0 = coords[n, 1, y, x]
                dx = x0 - np.floor(x0)
                dy = y0 - np.floor(y0)
                for i in range(rd + 1):
                    for j in range(rd + 1):
                        x1 = int(np.floor(x0)) - r + i
                        y1 = int(np.floor(y0)) - r + j
                        if 0 <= y1 < h2 and 0 <= x1 < w2:
                            s = volume[n, y, x, y1, x1]
                            if i > 0 and j > 0:
                                out[n, i - 1, j - 1, y, x] += s * dx * dy
                            if i > 0 and j < rd:
                                out[n, i - 1, j, y, x] += s * dx * (1 - dy)
                            if i < rd and j > 0:
                                out[n, i, j - 1, y, x] += s * (1 - dx) * dy
                            if i < rd and j < rd:
                                out[n, i, j, y, x] += s * (1 - dx) * (1 - dy)
    return out


def test_corr_index_matches_cuda_transcription():
    rng = np.random.default_rng(0)
    N, h1, w1, h2, w2, r = 2, 5, 6, 7, 8, 3
    volume = rng.normal(size=(N, h1, w1, h2, w2)).astype(np.float32)
    coords = rng.uniform(-3, 10, size=(N, 2, h1, w1)).astype(np.float32)
    ref = _oracle_corr_index(volume, coords, r)
    out = np.asarray(corr_index(jnp.asarray(volume), jnp.asarray(coords), r))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_corr_volume_and_pyramid():
    rng = np.random.default_rng(1)
    N, H, W, C = 1, 8, 12, 16
    f1 = rng.normal(size=(N, H, W, C)).astype(np.float32)
    f2 = rng.normal(size=(N, H, W, C)).astype(np.float32)
    v = np.asarray(corr_volume(jnp.asarray(f1), jnp.asarray(f2)))
    ref = np.einsum("nyxc,nvuc->nyxvu", f1, f2) / np.sqrt(C)
    np.testing.assert_allclose(v, ref, atol=1e-5, rtol=1e-5)

    pyr = corr_pyramid(jnp.asarray(v), num_levels=3)
    assert [tuple(p.shape[3:]) for p in pyr] == [(8, 12), (4, 6), (2, 3)]
    ref1 = v.reshape(N, H, W, 4, 2, 6, 2).mean(axis=(4, 6))
    np.testing.assert_allclose(np.asarray(pyr[1]), ref1, atol=1e-5)

    coords = jnp.asarray(
        rng.uniform(1, 6, size=(N, 2, H, W)).astype(np.float32))
    feat = corr_lookup_pyramid(pyr, coords, radius=2)
    assert feat.shape == (N, 3 * 25, H, W)
    assert np.isfinite(np.asarray(feat)).all()


def test_corr_flow_recovers_shift():
    """The corr_index-based matcher recovers a known integer shift on a
    textured pair (learned-features path, random encoder init)."""
    import cv2

    from wild_video_3d_reconstruction_tpu.eval.droid_harness import CorrFlow
    from wild_video_3d_reconstruction_tpu.models.vonet import init_vonet

    import jax

    rng = np.random.default_rng(0)
    HT, WD = 64, 96
    big = cv2.GaussianBlur(
        rng.integers(0, 255, (HT + 32, WD + 32, 3)).astype(np.uint8),
        (0, 0), 1.0)
    img_i = big[8:8 + HT, 8:8 + WD]
    img_j = big[8:8 + HT, 16:16 + WD]          # shift of -8 px in x

    ys, xs = np.meshgrid(np.arange(16, HT - 16, 8),
                         np.arange(16, WD - 16, 8), indexing="ij")
    gx = jnp.asarray(xs.reshape(-1), jnp.float32)
    gy = jnp.asarray(ys.reshape(-1), jnp.float32)

    params = init_vonet(jax.random.PRNGKey(0))
    cf = CorrFlow(params, gx, gy)
    seed = jnp.stack([gx, gy], -1)             # zero-flow seed
    flow = np.asarray(cf(img_i, img_j, seed))
    assert np.isfinite(flow).all()
    assert abs(np.median(flow[:, 0]) - (-8.0)) < 2.0
    assert abs(np.median(flow[:, 1])) < 2.0
