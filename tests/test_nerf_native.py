"""Native NeRF (nerf/ngp.py + nerf/train_native.py) unit + learning tests.

The reference's NeRF stage is an external nerfstudio invocation
(`nerf_train/nerf_train.py:21-42`); the rebuild's native field must (a)
get the encoding/rendering math right and (b) demonstrably learn a scene.
"""

import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from wild_video_3d_reconstruction_tpu.nerf import ngp  # noqa: E402
from wild_video_3d_reconstruction_tpu.nerf import train_native  # noqa: E402


def test_hash_encode_grid_corner_exact():
    """At an exact grid vertex the trilinear blend collapses to the single
    hashed corner entry — checks hashing + interpolation indexing."""
    key = jax.random.PRNGKey(0)
    table, res = ngp.hash_grid_init(key, levels=1, table_size=64,
                                    features=2, base_res=5, max_res=5)
    # x chosen so xs = x * (res-1) = 3 exactly on every axis
    x = jnp.asarray([[3.0 / 4.0, 3.0 / 4.0, 3.0 / 4.0]])
    out = ngp.hash_encode(x, table, res)
    idx = ngp._hash(jnp.asarray([[3, 3, 3]], jnp.int32), 64)[0]
    np.testing.assert_allclose(np.asarray(out[0]),
                               np.asarray(table[0, idx]), rtol=1e-6)


def test_hash_encode_continuity_and_shape():
    key = jax.random.PRNGKey(1)
    table, res = ngp.hash_grid_init(key, levels=4, table_size=256,
                                    features=2, base_res=4, max_res=32)
    x = jax.random.uniform(key, (17, 3))
    out = ngp.hash_encode(x, table, res)
    assert out.shape == (17, 8)
    eps = 1e-5
    out2 = ngp.hash_encode(x + eps, table, res)
    assert float(jnp.max(jnp.abs(out - out2))) < 1e-2  # Lipschitz-ish


def test_sh_encode_basis():
    d = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    sh = ngp.sh_encode(d)
    assert sh.shape == (2, 16)
    np.testing.assert_allclose(np.asarray(sh[:, 0]),
                               0.28209479177387814, rtol=1e-6)


def test_empty_field_renders_background():
    """Forcing sigma -> 0 must composite to pure background with zero
    accumulated opacity (checks the transmittance/compositing chain)."""
    params, static = ngp.field_init(jax.random.PRNGKey(0), levels=2,
                                    table_size=128, max_res=32)
    params["sigma2"]["w"] = params["sigma2"]["w"].at[:, 0].set(0.0)
    params["sigma2"]["b"] = params["sigma2"]["b"].at[0].set(-15.0)
    o = jnp.full((5, 3), 0.1)
    d = jnp.tile(jnp.asarray([[0.577, 0.577, 0.577]]), (5, 1))
    rgb, depth, acc = ngp.render_rays(params, static, o, d,
                                      jax.random.PRNGKey(1), n_samples=16,
                                      bg=0.75, stratified=False)
    np.testing.assert_allclose(np.asarray(rgb), 0.75, atol=1e-4)
    np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-4)


def test_camera_ray_conventions():
    c2w = np.eye(4)
    intr = [10.0, 10.0, 16.0, 12.0]
    o, d = ngp.camera_rays(c2w, intr, (24, 32), convention="opencv")
    center = np.asarray(d).reshape(24, 32, 3)[12, 16]
    assert center[2] > 0.99          # +z forward
    o, d = ngp.camera_rays(c2w, intr, (24, 32), convention="opengl")
    center = np.asarray(d).reshape(24, 32, 3)[12, 16]
    assert center[2] < -0.99         # -z forward
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1),
                               1.0, atol=1e-5)


def test_normalize_scene_bounds():
    pts = np.random.default_rng(0).uniform(-4, 9, (50, 3))
    center, scale = ngp.normalize_scene(pts, margin=0.2)
    unit = (pts - center) * scale + 0.5
    assert unit.min() >= 0.2 - 1e-6 and unit.max() <= 0.8 + 1e-6


def test_native_field_learns_synthetic_scene():
    """End-to-end: the field overfits a rendered multi-plane orbit scene —
    held-out PSNR improves by several dB over the random-init field."""
    images, c2ws, intrs, conv = train_native.synth_scene(seed=3, frames=6,
                                                         ht=24, wd=32)
    params, static, rep = train_native.train(
        images, c2ws, intrs, conv, steps=150, batch=512, n_samples=32,
        levels=6, table_size=2 ** 12, max_res=128, eval_every=150,
        holdout=6, log=lambda *a: None)
    assert rep["psnr"] > rep["psnr_init"] + 3.0, rep
    assert rep["psnr"] > 14.0, rep


def test_rodrigues_exponential():
    """so(3) exp: identity at 0, known 90-deg z-rotation, finite gradient
    at exactly zero (regression: the untaken where-branch used to emit
    0 * inf = NaN cotangents at w == 0)."""
    np.testing.assert_allclose(np.asarray(ngp.rodrigues(jnp.zeros(3))),
                               np.eye(3), atol=1e-7)
    Rz = ngp.rodrigues(jnp.asarray([0.0, 0.0, np.pi / 2]))
    np.testing.assert_allclose(
        np.asarray(Rz), [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6)
    g = jax.grad(lambda w: jnp.sum(ngp.rodrigues(w)
                                   @ jnp.asarray([1.0, 2.0, 3.0])))(
        jnp.zeros(3))
    assert bool(jnp.isfinite(g).all())
    # matches the tested SE3 implementation on a batch of random axes
    from wild_video_3d_reconstruction_tpu.ops import lie
    w = jax.random.normal(jax.random.PRNGKey(3), (16, 3)) * 0.7
    q = lie.so3_exp(w)
    np.testing.assert_allclose(np.asarray(ngp.rodrigues(w)),
                               np.asarray(lie.quat_to_matrix(q)),
                               atol=1e-5)


def test_contract_unbounded():
    """mipnerf-360 contraction: identity inside the unit ball, radius
    r -> 2 - 1/r outside, everything lands strictly inside radius 2."""
    x = jnp.asarray([[0.3, -0.2, 0.1], [3.0, 0.0, 0.0],
                     [0.0, -40.0, 0.0], [500.0, 500.0, 500.0]])
    y = np.asarray(ngp.contract(x))
    np.testing.assert_allclose(y[0], np.asarray(x[0]), atol=1e-7)
    np.testing.assert_allclose(y[1], [2 - 1 / 3, 0, 0], atol=1e-6)
    assert np.all(np.linalg.norm(y, axis=-1) < 2.0)


def test_sample_pdf_concentrates():
    """Importance sampling puts new depths inside the high-weight bin."""
    t = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (4, 9))
    w = jnp.zeros((4, 9)).at[:, 4].set(100.0)   # mass near t=0.5
    s = np.asarray(ngp._sample_pdf(jax.random.PRNGKey(0), t, w, 16))
    assert s.shape == (4, 16)
    assert np.all(s > 0.35) and np.all(s < 0.65), (s.min(), s.max())


def test_hier_empty_field_renders_background():
    key = jax.random.PRNGKey(1)
    params, static = ngp.field_init(key, levels=2, table_size=256,
                                    max_res=32, app_dim=4)
    params["sigma2"]["b"] = params["sigma2"]["b"].at[0].set(-30.0)
    o = jnp.full((8, 3), 0.5)
    d = jax.random.normal(key, (8, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    app = jnp.zeros((8, 4))
    for contraction in (False, True):
        rgb, depth, acc = ngp.render_rays_hier(
            params, static, o, d, key, n_coarse=8, n_fine=4, bg=0.7,
            app=app, contraction=contraction,
            far=64.0 if contraction else 1.8)
        np.testing.assert_allclose(np.asarray(rgb), 0.7, atol=1e-3)
        np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-3)


def test_mesh_sharded_training_matches_single_device():
    """The dp-sharded train step (ray batch split over the 8-device mesh,
    params replicated, GSPMD grad all-reduce) follows the same loss
    trajectory as the unsharded step — same seeds, same sampling."""
    from jax.sharding import Mesh

    images, c2ws, intrs, conv = train_native.synth_scene(seed=5, frames=5,
                                                         ht=24, wd=32)
    kw = dict(steps=8, batch=256, n_samples=16, levels=4,
              table_size=2 ** 10, max_res=64, eval_every=8, holdout=5,
              log=lambda *a: None)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    _, _, rep_mesh = train_native.train(images, c2ws, intrs, conv,
                                        mesh=mesh, **kw)
    _, _, rep_one = train_native.train(images, c2ws, intrs, conv, **kw)
    assert abs(rep_mesh["psnr"] - rep_one["psnr"]) < 0.15, \
        (rep_mesh, rep_one)


def test_pose_refinement_beats_frozen_poses_under_noise():
    """The nerfacto-equivalent trainer: with per-frame pose noise
    injected into the *training* views (eval poses kept exact), learned
    SE(3) refinement recovers registration and beats the frozen-pose
    run on held-out PSNR — the situation SLAM-estimated poses create."""
    from wild_video_3d_reconstruction_tpu.nerf import train_native as tn

    images, c2ws, intrs, conv = tn.synth_scene(seed=11, frames=8,
                                               ht=24, wd=32)
    rng = np.random.default_rng(0)
    noisy = np.array(c2ws)
    for i in range(len(noisy)):
        if i % 4 == 3:            # holdout=4 keeps eval poses exact
            continue
        noisy[i, :3, :3] = noisy[i, :3, :3] @ np.asarray(
            ngp.rodrigues(jnp.asarray(rng.normal(0, 0.04, 3),
                                      jnp.float32)))
        noisy[i, :3, 3] += rng.normal(0, 0.04, 3)

    kw = dict(steps=250, batch=768, n_coarse=16, n_fine=8,
              table_size=2 ** 12, max_res=128, levels=5, eval_every=250,
              holdout=4, log=lambda *a: None, app_dim=4)
    _, _, frozen = tn.train_refine(images, noisy, intrs, conv,
                                   refine_pose=False, **kw)
    # iid per-view noise with EXACT eval poses -> the raw gauge is the
    # right evaluator (interpolating anti-noise deltas onto exact eval
    # cameras would add error)
    _, _, refined = tn.train_refine(images, noisy, intrs, conv,
                                    refine_pose=True, eval_gauge="raw",
                                    **kw)
    assert refined["psnr"] > frozen["psnr"] + 0.5, (frozen, refined)
    assert 0.0 < refined["pose_delta_rms"] < 0.1, refined


def test_pose_refinement_interp_gauge_under_drift():
    """The round-2 regression regime: SMOOTH trajectory error shared by
    train AND eval views (SLAM drift). With the interpolated-gauge
    evaluator (default), refinement must not lose PSNR against the
    frozen-pose run — held-out cameras ride the refined trajectory."""
    from wild_video_3d_reconstruction_tpu.nerf import ngp
    from wild_video_3d_reconstruction_tpu.nerf import train_native as tn

    images, c2ws, intrs, conv = tn.synth_scene(seed=13, frames=8,
                                               ht=24, wd=32)
    n = len(c2ws)
    drift = np.array(c2ws)
    for i in range(n):
        s = i / max(n - 1, 1)                       # smooth ramp
        w = np.array([0.05, -0.03, 0.02]) * s
        t = np.array([0.05, 0.04, -0.05]) * s
        drift[i, :3, :3] = drift[i, :3, :3] @ np.asarray(
            ngp.rodrigues(jnp.asarray(w, jnp.float32)))
        drift[i, :3, 3] += t

    kw = dict(steps=250, batch=768, n_coarse=16, n_fine=8,
              table_size=2 ** 12, max_res=128, levels=5, eval_every=250,
              holdout=4, log=lambda *a: None, app_dim=4)
    _, _, frozen = tn.train_refine(images, drift, intrs, conv,
                                   refine_pose=False, **kw)
    _, _, refined = tn.train_refine(images, drift, intrs, conv,
                                    refine_pose=True, **kw)
    assert refined["psnr"] >= frozen["psnr"] - 0.2, (frozen, refined)


def test_eval_pose_alignment_recovers_perturbed_eval_views():
    """Test-time eval-pose alignment (nerfstudio protocol): train on
    EXACT poses, but hand the evaluator perturbed eval cameras — the
    per-view SE(3) alignment against the frozen field must recover most
    of the lost PSNR (raw eval scores the registration error, aligned
    eval scores the field)."""
    from wild_video_3d_reconstruction_tpu.nerf import train_native as tn

    images, c2ws, intrs, conv = tn.synth_scene(seed=12, frames=8,
                                               ht=24, wd=32)
    rng = np.random.default_rng(1)
    pert = np.array(c2ws)
    for i in range(len(pert)):
        if i % 4 != 3:            # holdout=4 -> perturb ONLY eval poses
            continue
        pert[i, :3, :3] = pert[i, :3, :3] @ np.asarray(
            ngp.rodrigues(jnp.asarray(rng.normal(0, 0.03, 3),
                                      jnp.float32)))
        pert[i, :3, 3] += rng.normal(0, 0.03, 3)

    _, _, rep = tn.train_refine(
        images, pert, intrs, conv, steps=250, batch=768, n_coarse=16,
        n_fine=8, table_size=2 ** 12, max_res=128, levels=5,
        eval_every=250, holdout=4, log=lambda *a: None, app_dim=4,
        refine_pose=False, eval_align=True, align_steps=80)
    assert rep["psnr_aligned"] > rep["psnr"] + 1.0, rep


def test_transforms_json_loader(tmp_path):
    import cv2

    img = (np.random.default_rng(0).uniform(0, 255, (16, 20, 3))
           .astype(np.uint8))
    cv2.imwrite(str(tmp_path / "000000.png"), img)
    meta = {"fl_x": 10.0, "fl_y": 10.0, "cx": 10.0, "cy": 8.0,
            "w": 20, "h": 16,
            "frames": [{"file_path": "000000.png",
                        "transform_matrix": np.eye(4).tolist()}]}
    with open(tmp_path / "transforms.json", "w", encoding="utf-8") as f:
        json.dump(meta, f)
    images, c2ws, intrs, conv = train_native.load_transforms(tmp_path)
    assert images.shape == (1, 16, 20, 3) and conv == "opengl"
    np.testing.assert_allclose(intrs[0], [10.0, 10.0, 10.0, 8.0])
    np.testing.assert_allclose(c2ws[0], np.eye(4))
