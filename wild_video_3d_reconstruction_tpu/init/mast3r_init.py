"""MASt3R-style scene bootstrap for the first frames of a sequence.

Counterpart of the reference's experimental `dpvo_mast3r_init.py:45-105`
(dust3r/mast3r pairwise inference + first-frame-anchored global alignment
-> per-frame depth maps and poses, injected into the patch graph). Two
paths:

  1. `mast3r_initialization()` — gated: when the external dust3r/mast3r
     packages are installed (they are not in this image), run the same
     first-frame-anchored alignment protocol and return its depths/poses.
  2. `geometric_initialization()` — self-contained classical fallback with
     the same contract and zero learned weights: pyramidal Lucas-Kanade
     tracks a stride grid from frame 0 into each bootstrap frame
     (forward-backward checked), a RANSAC normalized 8-point essential
     matrix gives the relative pose (cheirality-resolved), midpoint
     triangulation gives sparse structure, pairwise scales are chained to
     the (0,1) pair, and nearest-neighbor fill densifies each frame's
     depth map.

Either path's output feeds `prior_init.init_from_prior`, exactly like the
reference feeds `PatchGraph.init_from_prior` (`dpvo/patchgraph.py:112-140`).
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# two-view geometry: shared estimators live in init.epipolar (also used by
# the focal auto-calibration); re-exported here for the bootstrap's API
# ---------------------------------------------------------------------------

from .epipolar import (essential_ransac, recover_pose,  # noqa: F401,E402
                       triangulate_midpoint)


# ---------------------------------------------------------------------------
# multi-frame bootstrap
# ---------------------------------------------------------------------------

def _nearest_fill(sparse, mask):
    """Fill zeros of a sparse 2-D field from the nearest valid entry."""
    if mask.all() or not mask.any():
        return sparse
    from scipy.ndimage import distance_transform_edt
    _, (iy, ix) = distance_transform_edt(~mask, return_indices=True)
    return sparse[iy, ix]


def track_grid(images, stride=8, fb_thresh=1.0):
    """LK-track a stride grid from frame 0 into every other frame.

    Returns (grid_xy [M, 2], tracks [K, M, 2], ok [K, M]) where tracks[k]
    holds the grid's coordinates in frame k and `ok` is a forward-backward
    consistency mask (frame 0 row is the identity track).
    """
    import jax.numpy as jnp

    from ..eval.droid_harness import lk_flow_pyramid

    H, W = images[0].shape[:2]
    ys = np.arange(stride // 2, H, stride, dtype=np.float32)
    xs = np.arange(stride // 2, W, stride, dtype=np.float32)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    gx, gy = gx.reshape(-1), gy.reshape(-1)
    M = gx.size
    K = len(images)

    tracks = np.zeros((K, M, 2), np.float32)
    ok = np.zeros((K, M), bool)
    tracks[0] = np.stack([gx, gy], -1)
    ok[0] = True

    x0 = jnp.asarray(gx)
    y0 = jnp.asarray(gy)
    flow = jnp.zeros((M, 2), jnp.float32)
    img0 = jnp.asarray(images[0])
    for k in range(1, K):
        imgk = jnp.asarray(images[k])
        flow = lk_flow_pyramid(img0, imgk, x0, y0, flow)
        xk = np.asarray(jnp.stack([x0, y0], -1) + flow)
        # forward-backward check
        back = lk_flow_pyramid(imgk, img0, jnp.asarray(xk[:, 0]),
                               jnp.asarray(xk[:, 1]), -flow)
        fb = np.asarray(jnp.stack([jnp.asarray(xk[:, 0]) + back[:, 0],
                                   jnp.asarray(xk[:, 1]) + back[:, 1]], -1))
        err = np.linalg.norm(fb - tracks[0], axis=1)
        inb = ((xk[:, 0] >= 1) & (xk[:, 0] < W - 1) &
               (xk[:, 1] >= 1) & (xk[:, 1] < H - 1))
        tracks[k] = xk
        ok[k] = (err < fb_thresh) & inb
    return tracks[0], tracks, ok


def geometric_initialization(images, intrinsics, stride=8, ransac_iters=500,
                             seed=0, tracks=None, image_size=None):
    """Classical first-frame-anchored bootstrap over the given frames.

    images: [K][H, W, 3] uint8, or None when both `tracks` and
    `image_size` are supplied;
    intrinsics: [4] (fx, fy, cx, cy) full resolution;
    tracks: optional precomputed (grid_xy, tracks, ok) from `track_grid`
    (lets callers plug their own matcher, and tests feed exact synthetic
    correspondences); image_size: (H, W) of the depth maps to produce
    (defaults to images[0].shape).

    Returns (depths [K, H, W] float32, poses_c2w [K, 4, 4] float32) with
    frame 0 = identity and the global scale anchored so the (0, 1) pair's
    median frame-0 depth is 1. Mirrors the contract of
    `dpvo_mast3r_initialization` (`dpvo_mast3r_init.py:45-73`).
    """
    fx, fy, cx, cy = [float(v) for v in np.asarray(intrinsics).reshape(-1)[:4]]
    if tracks is None:
        grid, tr, ok = track_grid(images, stride=stride)
    else:
        grid, tr, ok = tracks
    if image_size is not None:
        H, W = image_size
    else:
        H, W = images[0].shape[:2]
    K = tr.shape[0]

    def norm(p):
        return np.stack([(p[:, 0] - cx) / fx, (p[:, 1] - cy) / fy], -1)

    x0n_all = norm(grid)

    poses_c2w = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    # accumulated frame-0 structure: per grid point, depth estimates
    depth0 = np.full((K, grid.shape[0]), np.nan, np.float32)
    pair_R, pair_t = [None] * K, [None] * K
    ref_med = None

    for k in range(1, K):
        m = ok[k]
        if m.sum() < 16:
            raise ValueError(f"too few tracked points into frame {k} "
                             f"({int(m.sum())}) — scene too hard for the "
                             "geometric bootstrap")
        x1n = x0n_all[m]
        x2n = norm(tr[k][m])
        E, inl = essential_ransac(x1n, x2n, iters=ransac_iters,
                                  seed=seed + k)
        R, t, X = recover_pose(E, x1n[inl], x2n[inl])
        z = X[:, 2]
        good = z > 1e-6
        med = float(np.median(z[good])) if good.any() else 1.0
        if ref_med is None:
            ref_med = med
            scale = 1.0
        else:
            # chain this pair's scale to the (0,1) pair via shared points
            sel = np.where(m)[0][inl]
            prev = depth0[1][sel]
            both = np.isfinite(prev) & good
            ratio = (np.median(prev[both] / np.maximum(z[both], 1e-9))
                     if both.sum() >= 8 else ref_med / med)
            scale = float(ratio)
        d = np.full(int(m.sum()), np.nan, np.float32)
        d[inl] = np.where(good, z * scale, np.nan)
        depth0[k][m] = d
        pair_R[k], pair_t[k] = R, t * scale
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = R
        w2c[:3, 3] = t * scale
        poses_c2w[k] = np.linalg.inv(w2c)

    # global scale: median frame-0 depth of the (0,1) pair -> 1
    s = float(np.nanmedian(depth0[1]))
    if not np.isfinite(s) or s <= 0:
        s = 1.0
    depth0 /= s
    for k in range(1, K):
        poses_c2w[k][:3, 3] /= s
        pair_t[k] = pair_t[k] / s

    # densify per-frame depth maps (grid points never tracked inlier in any
    # pair are all-NaN columns -> filled with the global median below)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        d0 = np.nanmedian(depth0, axis=0)    # robust frame-0 grid depth
    d0_fill = np.where(np.isfinite(d0), d0, np.nanmedian(d0))
    pts0 = np.concatenate([x0n_all * d0_fill[:, None], d0_fill[:, None]], 1)

    depths = np.zeros((K, H, W), np.float32)
    gy = np.clip(grid[:, 1].astype(int), 0, H - 1)
    gx = np.clip(grid[:, 0].astype(int), 0, W - 1)
    sp = np.zeros((H, W), np.float32)
    mk = np.zeros((H, W), bool)
    sp[gy, gx] = d0_fill
    mk[gy, gx] = np.isfinite(d0)
    depths[0] = _nearest_fill(sp, mk)
    for k in range(1, K):
        Xk = pts0 @ pair_R[k].T + pair_t[k][None, :]
        zk = Xk[:, 2]
        uk = np.clip((Xk[:, 0] / np.maximum(zk, 1e-6) * fx + cx).astype(int),
                     0, W - 1)
        vk = np.clip((Xk[:, 1] / np.maximum(zk, 1e-6) * fy + cy).astype(int),
                     0, H - 1)
        sp = np.zeros((H, W), np.float32)
        mk = np.zeros((H, W), bool)
        vis = zk > 1e-6
        sp[vk[vis], uk[vis]] = zk[vis]
        mk[vk[vis], uk[vis]] = True
        depths[k] = _nearest_fill(sp, mk)
    return depths, poses_c2w


def mast3r_initialization(images, intrinsics, **kw):
    """Reference protocol when mast3r/dust3r are installed; otherwise the
    geometric fallback (this image has zero egress and no mast3r).
    mast3r-only kwargs (checkpoint, device) are stripped before falling
    back; the rest pass through to `geometric_initialization`."""
    geo_kw = {k: v for k, v in kw.items()
              if k not in ("checkpoint", "device")}
    try:
        return _mast3r_external(images, intrinsics, **kw)
    except Exception as e:
        if not isinstance(e, ImportError):
            print(f"mast3r path failed ({type(e).__name__}: {e}); "
                  "using the geometric bootstrap")
        return geometric_initialization(images, intrinsics, **geo_kw)


def _mast3r_external(images, intrinsics, checkpoint=None, device="cpu",
                     **_):
    """External-model path: first-frame anchored global alignment
    (`dpvo_mast3r_init.py:45-73`). Only importable where dust3r/mast3r
    exist; the public dust3r API has moved between releases, so every
    import stays inside this function and any failure falls back to the
    geometric path in the caller."""
    import dust3r  # noqa: F401
    import mast3r  # noqa: F401
    import torch
    from dust3r.cloud_opt import GlobalAlignerMode, global_aligner
    from dust3r.image_pairs import make_pairs
    from dust3r.inference import inference
    try:                                  # API moved across releases
        from dust3r.inference import load_model
    except ImportError:
        from dust3r.model import AsymmetricCroCo3DStereo

        def load_model(ckpt, device):
            return AsymmetricCroCo3DStereo.from_pretrained(ckpt).to(device)

    model = load_model(checkpoint, device)
    imgs = _format_mast3r_images(images, device)
    pairs = make_pairs(imgs, scene_graph="complete", prefilter=None,
                       symmetrize=False)
    res = inference(pairs, model, device, batch_size=1)
    scene = global_aligner(res, device=device,
                           mode=GlobalAlignerMode.ModularPointCloudOptimizer)
    with torch.enable_grad():
        scene.compute_global_alignment(init="mst", niter=250,
                                       schedule="cosine", lr=0.01)
    depths = np.stack([np.asarray(d.detach().cpu())
                       for d in scene.get_depthmaps()])
    poses = np.stack([np.asarray(p.detach().cpu())
                      for p in scene.get_im_poses()])
    return depths.astype(np.float32), poses.astype(np.float32)


def _format_mast3r_images(images, device):
    """numpy uint8 frames -> the dict format dust3r's loaders produce."""
    import torch

    out = []
    for i, im in enumerate(images):
        t = torch.from_numpy(np.ascontiguousarray(im[..., ::-1])).float()
        t = (t / 127.5 - 1.0).permute(2, 0, 1)[None].to(device)
        out.append(dict(img=t, true_shape=np.int32([im.shape[:2]]),
                        idx=i, instance=str(i)))
    return out


def bootstrap_slam(slam, images, intrinsics, **kw):
    """Run the bootstrap and inject its depths/poses into a DPVO instance
    (the frames must already be inserted). Mirrors the reference wiring of
    mast3r init -> `PatchGraph.init_from_prior`."""
    from .prior_init import anchor_first_frame, init_from_prior

    depths, poses_c2w = mast3r_initialization(images, intrinsics, **kw)
    init_from_prior(slam, depths, poses_c2w, range(len(images)))
    anchor_first_frame(slam)
    return depths, poses_c2w
