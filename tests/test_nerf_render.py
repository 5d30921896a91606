"""Downstream NeRF tooling: checkpoint round-trip with metadata, camera
paths, novel-view rendering, and point-cloud export (`nerf/render.py`) —
the role nerfstudio's ns-render / ns-export play after the reference's
`ns-train` stage (`nerf_train/nerf_train.py:21-42`)."""

import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from wild_video_3d_reconstruction_tpu.nerf import (  # noqa: E402
    ngp, render, train_native)


pytestmark = pytest.mark.slow  # integration/soak tier


def _tiny_train(tmp_path, refine=False, steps=8):
    """A few steps on a tiny synthetic scene; save + reload the field."""
    images, c2ws, intrs, conv = train_native.synth_scene(
        seed=3, frames=5, ht=20, wd=24)
    kw = dict(steps=steps, batch=128, levels=2, table_size=2 ** 10,
              max_res=32, eval_every=steps, holdout=5, log=lambda *a: None)
    if refine:
        params, static, rep = train_native.train_refine(
            images, c2ws, intrs, conv, n_coarse=8, n_fine=4, app_dim=4,
            **kw)
        meta = dict(refine=True, contract=False, levels=2,
                    table_size=2 ** 10, max_res=32, app_dim=4,
                    n_train=int(params["app"].shape[0]),
                    center=np.asarray(rep["center"]).tolist(),
                    scale=float(rep["scale"]), near=rep["near"],
                    far=rep["far"], convention=conv, samples=8)
    else:
        params, static, rep = train_native.train(
            images, c2ws, intrs, conv, n_samples=8, **kw)
        meta = dict(refine=False, contract=False, levels=2,
                    table_size=2 ** 10, max_res=32, app_dim=0, n_train=0,
                    center=np.asarray(rep["center"]).tolist(),
                    scale=float(rep["scale"]), near=rep["near"],
                    far=rep["far"], convention=conv, samples=8)
    ckpt = tmp_path / ("field_refine" if refine else "field")
    render.save_field(params, meta, ckpt, steps)
    return params, ckpt, (images, c2ws, intrs, conv)


def test_save_load_roundtrip(tmp_path):
    params, ckpt, _ = _tiny_train(tmp_path)
    field, static, meta = render.load_field(ckpt)
    assert meta["refine"] is False
    np.testing.assert_array_equal(np.asarray(field["table"]),
                                  np.asarray(params["table"]))
    assert static["level_res"].shape == (2,)

    # pointing at the step dir directly also works
    field2, _, _ = render.load_field(ckpt / "step_8")
    np.testing.assert_array_equal(np.asarray(field2["sigma1"]["w"]),
                                  np.asarray(field["sigma1"]["w"]))


def test_save_load_refine_extracts_field(tmp_path):
    params, ckpt, _ = _tiny_train(tmp_path, refine=True)
    field, static, meta = render.load_field(ckpt)
    assert meta["refine"] and meta["app_dim"] == 4
    np.testing.assert_array_equal(np.asarray(field["table"]),
                                  np.asarray(params["field"]["table"]))


def test_interpolate_path_properties():
    rng = np.random.default_rng(0)
    keys = []
    for i in range(4):
        w = rng.normal(size=3) * 0.3
        c2w = np.eye(4)
        c2w[:3, :3] = np.asarray(ngp.rodrigues(w))
        c2w[:3, 3] = rng.normal(size=3)
        keys.append(c2w)
    path = render.interpolate_path(keys, 13)
    assert path.shape == (13, 4, 4)
    # endpoints hit the first/last keyframes
    np.testing.assert_allclose(path[0], keys[0], atol=1e-9)
    np.testing.assert_allclose(path[-1], keys[-1], atol=1e-9)
    # every rotation stays orthonormal with det +1
    for c2w in path:
        R = c2w[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
        assert np.linalg.det(R) > 0.99
    # a keyframe in the middle is passed through exactly
    np.testing.assert_allclose(path[4], keys[1], atol=1e-9)

    looped = render.interpolate_path(keys, 8, loop=True)
    assert looped.shape == (8, 4, 4)
    assert not np.allclose(looped[-1], keys[-1])  # heads back to start


def test_render_path_and_pointcloud(tmp_path):
    _, ckpt, (images, c2ws, intrs, conv) = _tiny_train(tmp_path)
    field, static, meta = render.load_field(ckpt)
    hw = images.shape[1:3]

    path = render.interpolate_path(c2ws[:3], 2)
    frames = render.render_path(field, static, meta, path, intrs[0], hw,
                                out_dir=tmp_path / "renders",
                                video=tmp_path / "path.mp4",
                                log=lambda *a: None, chunk=512)
    assert frames.shape == (2, hw[0], hw[1], 3)
    assert frames.dtype == np.uint8
    assert (tmp_path / "renders" / "00000.png").exists()
    assert (tmp_path / "renders" / "00001.png").exists()
    assert (tmp_path / "path.mp4").stat().st_size > 0

    n = render.export_pointcloud(field, static, meta, c2ws[:2], intrs[:2],
                                 hw, tmp_path / "cloud.ply",
                                 acc_thresh=0.0, chunk=512)
    assert n > 0
    assert (tmp_path / "cloud.ply").stat().st_size > 0
    # world-space points should land near the synthetic scene's content
    from wild_video_3d_reconstruction_tpu.io.export import load_ply
    pts = load_ply(tmp_path / "cloud.ply")
    assert np.isfinite(pts).all()


def test_render_cli(tmp_path):
    _, ckpt, _ = _tiny_train(tmp_path)
    rep = render.main([
        "--ckpt", str(ckpt), "--synth", "--n", "2",
        "--out", str(tmp_path / "cli_renders"),
        "--pointcloud", str(tmp_path / "cli.ply"), "--stride", "4",
        "--acc_thresh", "0.0"])
    assert rep["views"] == 2 and rep["points"] > 0
