"""Native C++ host runtime: build, neighbors parity, binary retrieval."""

import numpy as np
import pytest

from wild_video_3d_reconstruction_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_neighbors_matches_python(lib):
    rng = np.random.default_rng(0)
    kk = rng.integers(0, 40, size=300)
    jj = np.zeros(300, dtype=int)
    for u in np.unique(kk):
        m = kk == u
        jj[m] = rng.choice(100, size=m.sum(), replace=False)
    ix, jx = native.neighbors(kk, jj)

    # python reference (identical contract to fastba.neighbors)
    import jax.numpy as jnp

    from wild_video_3d_reconstruction_tpu.ops import segment
    ix2, jx2 = segment.neighbors(jnp.asarray(kk), jnp.asarray(jj))
    np.testing.assert_array_equal(ix, np.asarray(ix2))
    np.testing.assert_array_equal(jx, np.asarray(jx2))


def test_edge_capacity_matches_config(lib):
    import ctypes

    from wild_video_3d_reconstruction_tpu.utils.config import DPVOConfig
    cfg = DPVOConfig(PATCHES_PER_FRAME=48, PATCH_LIFETIME=11,
                     REMOVAL_WINDOW=16)
    cap_cpp = lib.edge_capacity(48, 11, 16)
    # python computes the same simulation then rounds up to 1024
    assert ((cap_cpp + 1023) // 1024) * 1024 == cfg.edge_capacity


def test_binary_retrieval_finds_revisit(lib):
    rng = np.random.default_rng(1)
    base_scene = rng.normal(size=(128, 64)).astype(np.float32)
    retr = native.BinaryRetrieval(rad=5)
    for i in range(12):
        if i in (0, 10):
            desc = base_scene + 0.05 * rng.normal(size=base_scene.shape)
        else:
            desc = rng.normal(size=(128, 64)).astype(np.float32)
        retr.insert_image(i, desc)
    j, score, matches = retr.query(10)
    assert j == 0, (j, score)
    idx0, idx1 = matches
    assert len(idx0) > 60     # most descriptors match their counterpart
    assert np.mean(idx0 == idx1) > 0.8
    retr.close()
