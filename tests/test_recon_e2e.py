"""End-to-end pipeline smoke: video -> SLAM -> COLMAP -> NeRF.

Drives `eval/recon_e2e.py` — the rebuilt equivalent of the reference's
full `dpvo_demo.py` -> `nerf_prepare.py` -> `nerf_train.py` chain — on a
tiny rendered sequence and asserts every stage hands off correctly.
"""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration/soak tier



def test_recon_pipeline_end_to_end(tmp_path):
    from wild_video_3d_reconstruction_tpu.eval import recon_e2e

    frames = 14
    rep = recon_e2e.run(frames=frames, nerf_steps=5, workdir=str(tmp_path))

    # SLAM produced a pose for every input frame and ATE is finite
    assert rep["n_aligned"] == frames
    assert np.isfinite(rep["ate_rmse"])

    # the prepare stage wrote a transforms.json covering the sequence
    tf = tmp_path / "output" / "nerf" / "transforms.json"
    with open(tf, encoding="utf-8") as f:
        meta = json.load(f)
    assert len(meta["frames"]) == frames
    ids = sorted(f["colmap_im_id"] for f in meta["frames"])
    assert ids == list(range(1, frames + 1))
    for k in ("fl_x", "fl_y", "cx", "cy", "w", "h", "applied_transform"):
        assert k in meta

    # the exported COLMAP binary model round-trips
    from wild_video_3d_reconstruction_tpu.io import colmap_model
    recon = (tmp_path / "output" / "colmap_images" / "colmap" /
             "sparse" / "0")
    cameras, images, points = colmap_model.read_model(recon)
    assert len(images) == frames and len(cameras) == 1

    # NeRF training ran and produced a finite PSNR
    assert np.isfinite(rep["psnr"]) and rep["psnr"] > 5.0

    # batch clip preparation over the same model (nerf_prepare_batch.py)
    from wild_video_3d_reconstruction_tpu.nerf import prepare, train
    clip_dir = tmp_path / "clips"
    out = prepare.prepare_clips(recon, clip_dir, [(1, 8), (8, frames)])
    assert sorted(out) == ["select_1_8", f"select_8_{frames}"]
    with open(out["select_1_8"], encoding="utf-8") as f:
        # inclusive [start, end] slicing, matching nerf_prepare.py
        assert len(json.load(f)["frames"]) == 8

    # the training sweep discovers both prepared clips
    res = train.train_clips(clip_dir, native_fallback=False)
    assert sorted(res) == ["select_1_8/ours", f"select_8_{frames}/ours"]
