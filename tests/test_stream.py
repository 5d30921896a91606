"""IO stream unit tests: image/depth/mask/video paths, crop-16, depth
clamp, stride/skip (port of `dpvo/stream.py` behaviors)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from wild_video_3d_reconstruction_tpu.io import stream


@pytest.fixture()
def scene(tmp_path):
    rng = np.random.default_rng(0)
    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    (tmp_path / "mask").mkdir()
    H, W = 70, 100                    # deliberately not multiples of 16
    for t in range(6):
        img = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
        cv2.imwrite(str(tmp_path / "rgb" / f"{t:04d}.png"), img)
        depth = rng.uniform(0.5, 2.0, size=(H, W)).astype(np.float32)
        depth[0, 0] = 1e6             # outlier the 10x-median clamp removes
        np.save(tmp_path / "depth" / f"{t:04d}.npy", depth)
        mask = (rng.uniform(size=(H, W)) > 0.5).astype(np.uint8) * 255
        cv2.imwrite(str(tmp_path / "mask" / f"{t:04d}.png"), mask)
    return tmp_path


def test_image_stream_crop_depth_mask(scene):
    calib = np.array([50.0, 50.0, 50.0, 35.0])
    frames = list(stream.image_frames(
        scene / "rgb", scene / "depth", scene / "mask", calib))
    assert len(frames) == 6
    t, img, depth, mask, intr = frames[0]
    assert img.shape == (64, 96, 3)            # cropped to multiple of 16
    assert depth.shape == (64, 96)
    assert mask.shape == (64, 96) and mask.dtype == bool
    med = np.median(depth[depth > 0])
    assert depth.max() <= 10 * med + 1e-3      # outlier clamped
    np.testing.assert_array_equal(intr, calib)


def test_image_stream_stride_skip(scene):
    calib = np.array([50.0, 50.0, 50.0, 35.0])
    frames = list(stream.image_frames(scene / "rgb", None, None, calib,
                                      stride=2, skip=1))
    assert len(frames) == 3                    # files 1, 3, 5


def test_video_stream_half_resolution(scene, tmp_path):
    calib_f = tmp_path / "calib.txt"
    np.savetxt(calib_f, np.array([[50.0, 50.0, 50.0, 35.0]]))
    vid = tmp_path / "clip.avi"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"MJPG"), 10,
                        (96, 64))
    rng = np.random.default_rng(1)
    for _ in range(5):
        w.write(rng.integers(0, 255, size=(64, 96, 3), dtype=np.uint8))
    w.release()

    frames = list(stream.video_frames(vid, str(calib_f)))
    assert len(frames) == 5
    t, img, depth, mask, intr = frames[0]
    assert img.shape[0] == 32 and img.shape[1] == 48   # halved
    # intrinsics scaled with the resolution
    assert intr[0] == pytest.approx(25.0)


def test_prefetcher_drains(scene):
    calib = np.array([50.0, 50.0, 50.0, 35.0])
    gen = stream.image_frames(scene / "rgb", None, None, calib)
    out = list(stream.Prefetcher(gen, maxsize=2))
    assert len(out) == 6
    assert out[0][0] == 0 and out[-1][0] == 5


def test_prefetcher_propagates_fill_errors():
    # a generator failure (decode error, dead device upload, ...) must
    # surface in the consuming thread, not silently truncate the stream
    def gen():
        yield (0, np.zeros((16, 16, 3), np.uint8), None, None,
               np.zeros(4))
        raise ValueError("boom")

    it = iter(stream.Prefetcher(gen(), maxsize=2))
    assert next(it)[0] == 0
    with pytest.raises(RuntimeError, match="prefetch thread failed"):
        list(it)
