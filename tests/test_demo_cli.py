"""End-to-end CLI test: images on disk -> trajectory + PLY + COLMAP export."""

import numpy as np
import pytest

import cv2
import yaml


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    big = rng.integers(0, 255, (120, 160, 3), np.uint8)
    for t in range(16):
        y, x = (3 * t) % 48, (4 * t) % 64
        cv2.imwrite(str(d / f"{t:06d}.png"), big[y:y + 64, x:x + 80])
    return d


def test_demo_run(tmp_path, image_dir, monkeypatch):
    from wild_video_3d_reconstruction_tpu import demo
    from wild_video_3d_reconstruction_tpu.slam import dpvo as dpvo_mod

    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text(yaml.safe_dump(dict(
        BUFFER_SIZE=64, PATCHES_PER_FRAME=8, REMOVAL_WINDOW=6,
        OPTIMIZATION_WINDOW=4, PATCH_LIFETIME=3, KEYFRAME_INDEX=2,
        MEM=12, GRADIENT_BIAS=False, CORR_CHUNK=512, PALLAS_CORR=False)))
    calib = tmp_path / "calib.txt"
    calib.write_text("50.0 50.0 40.0 32.0\n")

    # random weights park every frame behind the motion gate; bypass it
    monkeypatch.setattr(dpvo_mod.DPVO, "_probe_value", None, raising=False)
    orig_init = dpvo_mod.DPVO.__init__

    def patched(self, *a, **kw):
        orig_init(self, *a, **kw)
        self._probe = lambda *a: 100.0

    monkeypatch.setattr(dpvo_mod.DPVO, "__init__", patched)

    out = tmp_path / "out"
    demo.main([
        "--imagedir", str(image_dir), "--calib", str(calib),
        "--config", str(cfg_file), "--path", str(out), "--buffer", "64",
        "--stride", "1", "--network", "missing.pth",
        "--save_trajectory", "--save_reconstruction", "--export_colmap",
        "--plot",
    ])

    traj = out / "saved_trajectories" / f"{image_dir.name}.txt"
    assert traj.exists()
    data = np.loadtxt(traj)
    assert data.shape == (16, 8)
    assert np.all(np.isfinite(data))
    assert (out / f"{image_dir.name}.ply").exists()
    assert (out / f"colmap_{image_dir.name}" / "transforms.json").exists()
    assert (out / "config.yaml").exists()


def test_demo_checkpoint_resume(tmp_path, image_dir, monkeypatch):
    """--checkpoint_every snapshots mid-run; --resume continues and emits
    the same-length trajectory as an uninterrupted run."""
    from wild_video_3d_reconstruction_tpu import demo
    from wild_video_3d_reconstruction_tpu.slam import dpvo as dpvo_mod

    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text(yaml.safe_dump(dict(
        BUFFER_SIZE=64, PATCHES_PER_FRAME=8, REMOVAL_WINDOW=6,
        OPTIMIZATION_WINDOW=4, PATCH_LIFETIME=3, KEYFRAME_INDEX=2,
        MEM=12, GRADIENT_BIAS=False, CORR_CHUNK=512, PALLAS_CORR=False)))
    calib = tmp_path / "calib.txt"
    calib.write_text("50.0 50.0 40.0 32.0\n")

    orig_init = dpvo_mod.DPVO.__init__

    def patched(self, *a, **kw):
        orig_init(self, *a, **kw)
        self._probe = lambda *a: 100.0

    monkeypatch.setattr(dpvo_mod.DPVO, "__init__", patched)

    out1 = tmp_path / "out1"
    demo.main([
        "--imagedir", str(image_dir), "--calib", str(calib),
        "--config", str(cfg_file), "--path", str(out1), "--buffer", "64",
        "--network", "missing.pth", "--save_trajectory", "--stride", "1",
        "--checkpoint_every", "6",
    ])
    assert (out1 / "slam_ckpt" / "state.npz").exists()

    out2 = tmp_path / "out2"
    demo.main([
        "--imagedir", str(image_dir), "--calib", str(calib),
        "--config", str(cfg_file), "--path", str(out2), "--buffer", "64",
        "--network", "missing.pth", "--save_trajectory", "--stride", "1",
        "--resume", str(out1 / "slam_ckpt"),
    ])
    t1 = np.loadtxt(out1 / "saved_trajectories" / f"{image_dir.name}.txt")
    t2 = np.loadtxt(out2 / "saved_trajectories" / f"{image_dir.name}.txt")
    assert t1.shape == t2.shape == (16, 8)
    assert np.isfinite(t2).all()
    # timestamps identical; the resumed run covers every frame
    np.testing.assert_array_equal(t1[:, 0], t2[:, 0])
