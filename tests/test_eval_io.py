"""Tests for metrics, export round-trips and COLMAP model IO."""

import numpy as np
import jax.numpy as jnp

from wild_video_3d_reconstruction_tpu.eval import metrics
from wild_video_3d_reconstruction_tpu.io import colmap_model, export
from wild_video_3d_reconstruction_tpu.ops import lie


def random_traj(n, seed=0):
    rng = np.random.default_rng(seed)
    xi = 0.1 * rng.normal(size=(n, 6)).astype(np.float32)
    return np.asarray(lie.se3_exp(jnp.asarray(xi)))


def test_ate_zero_for_sim3_transformed():
    poses = random_traj(30)
    t = np.arange(30, dtype=float)
    # apply a random Sim3 to the trajectory: ATE must be ~0
    rng = np.random.default_rng(1)
    R, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    s, tr = 2.0, rng.normal(size=3)
    warped = poses.copy()
    warped[:, :3] = (s * (R @ poses[:, :3].T)).T + tr
    err, n = metrics.ate_rmse(warped, t, poses, t)
    assert n == 30
    assert err < 1e-5


def test_ate_detects_error():
    poses = random_traj(30)
    t = np.arange(30, dtype=float)
    noisy = poses.copy()
    noisy[:, :3] += 0.05 * np.random.default_rng(2).normal(size=(30, 3))
    err, _ = metrics.ate_rmse(noisy, t, poses, t)
    assert 0.01 < err < 0.2


def test_associate_offsets():
    ta = np.arange(10, dtype=float)
    tb = ta + 0.01
    ia, ib = metrics.associate(ta, tb, max_diff=0.02)
    assert len(ia) == 10
    np.testing.assert_array_equal(ia, ib)


def test_tum_roundtrip(tmp_path):
    poses = random_traj(5)
    t = np.arange(5, dtype=float)
    f = tmp_path / "traj.txt"
    export.save_trajectory_tum_format(poses, t, f)
    p2, t2 = export.load_trajectory_tum_format(f)
    np.testing.assert_allclose(p2, poses, atol=1e-6)
    np.testing.assert_allclose(t2, t)


def test_colmap_model_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    cams = {1: colmap_model.Camera(1, "PINHOLE", 640, 480,
                                   np.array([500.0, 500.0, 320.0, 240.0]))}
    ims = {}
    for i in range(1, 4):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        ims[i] = colmap_model.Image(i, q, rng.normal(size=3), 1,
                                    f"im_{i}.png")
    pts = {j: colmap_model.Point3D(j, rng.normal(size=3),
                                   rng.integers(0, 255, 3))
           for j in range(1, 6)}

    colmap_model.write_text(tmp_path / "txt", cams, ims, pts)
    c2, i2, p2 = colmap_model.read_text(tmp_path / "txt")
    np.testing.assert_allclose(i2[2].qvec, ims[2].qvec, atol=1e-9)
    np.testing.assert_allclose(p2[3].xyz, pts[3].xyz, atol=1e-9)

    colmap_model.write_binary(tmp_path / "bin", cams, ims, pts)
    c3, i3, p3 = colmap_model.read_binary(tmp_path / "bin")
    np.testing.assert_allclose(i3[2].qvec, ims[2].qvec, atol=1e-12)
    np.testing.assert_allclose(p3[3].xyz, pts[3].xyz, atol=1e-12)
    assert c3[1].model == "PINHOLE"


def test_full_colmap_export(tmp_path):
    poses = random_traj(4)
    t = np.arange(4, dtype=float)
    pts = np.random.default_rng(4).normal(size=(10, 3))
    clr = np.random.default_rng(5).integers(0, 255, size=(10, 3))
    out = export.save_output_for_colmap(
        tmp_path / "colmap_x", poses, t, pts, clr, 400, 400, 320, 240,
        480, 640)
    assert (out / "images.txt").exists()
    assert (out / "colmap" / "sparse" / "0" / "cameras.bin").exists()
    assert (out / "transforms.json").exists()
    import json
    tf = json.load(open(out / "transforms.json"))
    assert len(tf["frames"]) == 4
    # w2c/c2w consistency: re-read model and compare camera centers
    _, ims, _ = colmap_model.read_binary(out / "colmap" / "sparse" / "0")
    for idx, im in ims.items():
        C = np.linalg.inv(im.w2c_matrix())[:3, 3]
        np.testing.assert_allclose(C, poses[idx - 1, :3], atol=1e-5)


def test_ply_export(tmp_path):
    pts = np.random.default_rng(6).normal(size=(7, 3)).astype(np.float32)
    clr = np.random.default_rng(7).integers(0, 255, size=(7, 3))
    f = tmp_path / "cloud.ply"
    export.save_ply(f, pts, clr)
    data = open(f, "rb").read()
    assert data.startswith(b"ply")
    assert b"element vertex 7" in data


def test_kitti_rel_err_and_ate_scale():
    """TartanAir-evaluator parity metrics: zero error on identical
    trajectories; known scale recovered by ate_scale."""
    from wild_video_3d_reconstruction_tpu.eval import metrics

    rng = np.random.default_rng(3)
    n = 400
    # smooth forward path, ~1.5 m/frame -> > 800 m total
    steps = 1.5 + 0.1 * rng.normal(size=n)
    xyz = np.zeros((n, 3))
    xyz[:, 0] = np.cumsum(steps)
    xyz[:, 1] = np.sin(np.linspace(0, 4, n)) * 5
    poses = np.zeros((n, 7))
    poses[:, :3] = xyz
    poses[:, 6] = 1.0

    t_rel, r_rel, cnt = metrics.kitti_rel_err(poses, poses)
    assert cnt > 0
    assert t_rel < 1e-9 and r_rel < 1e-9

    est = poses.copy()
    est[:, :3] *= 0.5                      # half-scale estimate
    ts = np.arange(n, dtype=float)
    rmse, s, na = metrics.ate_scale(est, ts, poses, ts)
    assert na == n
    assert abs(s - 2.0) < 1e-6
    assert rmse < 1e-9


def test_camera_model_translation():
    """COLMAP camera models -> nerfstudio intrinsics, per the reference
    formatter's table (`formatter/colmap_utilis.py:38-222`)."""
    C = colmap_model.Camera

    j = export.camera_intrinsics_json(
        C(1, "OPENCV", 640, 480,
          np.array([500., 510., 320., 240., .1, .01, .001, .0002])))
    assert j["camera_model"] == "OPENCV"
    assert (j["fl_x"], j["fl_y"]) == (500.0, 510.0)
    assert (j["k1"], j["k2"], j["p1"], j["p2"]) == (0.1, 0.01, 0.001, 0.0002)

    j = export.camera_intrinsics_json(
        C(1, "SIMPLE_RADIAL", 640, 480, np.array([500., 320., 240., .05])))
    assert j["fl_x"] == j["fl_y"] == 500.0
    assert (j["k1"], j["k2"], j["p1"], j["p2"]) == (0.05, 0.0, 0.0, 0.0)

    j = export.camera_intrinsics_json(
        C(1, "RADIAL", 640, 480, np.array([500., 320., 240., .05, -.01])))
    assert (j["k1"], j["k2"]) == (0.05, -0.01)

    j = export.camera_intrinsics_json(
        C(1, "OPENCV_FISHEYE", 640, 480,
          np.array([500., 510., 320., 240., .1, .01, .001, .0001])))
    assert j["camera_model"] == "OPENCV_FISHEYE"
    assert (j["k1"], j["k2"], j["k3"], j["k4"]) == (0.1, 0.01, 0.001, 0.0001)
    assert "p1" not in j

    j = export.camera_intrinsics_json(
        C(1, "RADIAL_FISHEYE", 640, 480,
          np.array([500., 320., 240., .1, .01])))
    assert (j["k1"], j["k2"], j["k3"], j["k4"]) == (0.1, 0.01, 0.0, 0.0)

    j = export.camera_intrinsics_json(
        C(1, "SIMPLE_PINHOLE", 640, 480, np.array([500., 320., 240.])))
    assert (j["k1"], j["k2"], j["p1"], j["p2"]) == (0.0, 0.0, 0.0, 0.0)

    import pytest
    for model, n in (("FULL_OPENCV", 12), ("FOV", 5),
                     ("THIN_PRISM_FISHEYE", 12)):
        with pytest.raises(ValueError):
            export.camera_intrinsics_json(
                C(1, model, 640, 480, np.zeros(n)))
