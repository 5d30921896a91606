"""Training data pipeline on a synthetic TartanAir-layout scene."""

import numpy as np
import pytest

import cv2

from wild_video_3d_reconstruction_tpu.train.data import (TartanAirDataset,
                                                         dataset_factory)


@pytest.fixture(scope="module")
def tartan_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("tartan")
    scene = root / "env" / "env" / "Easy" / "P001"
    (scene / "image_left").mkdir(parents=True)
    (scene / "depth_left").mkdir(parents=True)
    rng = np.random.default_rng(0)
    n = 24
    poses = []
    for i in range(n):
        img = rng.integers(0, 255, (96, 128, 3), np.uint8)
        cv2.imwrite(str(scene / "image_left" / f"{i:06d}.png"), img)
        depth = rng.uniform(4.0, 8.0, (96, 128)).astype(np.float32)
        np.save(scene / "depth_left" / f"{i:06d}.npy", depth)
        # NED pose layout: (x, y, z, qx, qy, qz, qw) pre-remap
        poses.append([0.2 * i, 0.0, 0.0, 0, 0, 0, 1])
    np.savetxt(scene / "pose_left.txt", np.asarray(poses, float),
               delimiter=" ")
    return str(root)


def test_dataset_builds_and_samples(tartan_root):
    ds = TartanAirDataset(tartan_root, n_frames=4, fmin=0.5, fmax=500.0,
                          image_size=(64, 96))
    assert len(ds.scenes) == 1
    rng = np.random.default_rng(1)
    images, poses, disps, intr = ds.sample_clip(rng)
    assert images.shape == (4, 64, 96, 3)
    assert poses.shape == (4, 7)
    assert disps.shape == (4, 16, 24)
    assert np.all(np.isfinite(poses)) and np.all(disps > 0)
    # disparity normalization: 98th percentile around 1/0.7
    assert 0.5 < np.quantile(disps, 0.98) < 3.0


def test_batches_shape(tartan_root):
    ds = dataset_factory(["tartan"], tartan_root, n_frames=4, fmin=0.5,
                         fmax=500.0, image_size=(64, 96))
    batch = next(ds.batches(batch_size=2, steps=1))
    assert batch["images"].shape == (2, 4, 64, 96, 3)
    assert batch["poses"].shape == (2, 4, 7)
    assert batch["disps"].shape == (2, 4, 16, 24)
    assert batch["intrinsics"].shape == (2, 4)


def test_logger(tmp_path):
    from wild_video_3d_reconstruction_tpu.train.trainer import Logger
    lg = Logger("t", logdir=tmp_path)
    lg.SUM_FREQ = 2
    lg.push({"loss": 1.0})
    lg.push({"loss": 3.0})
    lg.close()
    lines = open(lg.logdir / "metrics.jsonl").read().strip().splitlines()
    import json
    rec = json.loads(lines[-1])
    assert rec["loss"] == 2.0


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from wild_video_3d_reconstruction_tpu.models.update import init_update
    from wild_video_3d_reconstruction_tpu.train.trainer import (
        export_torch_checkpoint, load_checkpoint, save_checkpoint)
    params = {"update": init_update(jax.random.PRNGKey(0))}
    p = save_checkpoint(params, tmp_path / "ck", 1)
    back = load_checkpoint(p, params)
    np.testing.assert_allclose(
        np.asarray(back["update"]["norm"]["weight"]),
        np.asarray(params["update"]["norm"]["weight"]))
    f = export_torch_checkpoint(params, tmp_path / "model.pth")
    import torch
    sd = torch.load(f, weights_only=True)
    assert "update.norm.weight" in sd
