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
# two-view geometry (numpy; runs once at startup, not on the hot path)
# ---------------------------------------------------------------------------

def essential_ransac(x1n, x2n, iters=500, thresh=1e-3, seed=0):
    """RANSAC normalized 8-point essential matrix.

    x1n/x2n: [N, 2] matched points in *normalized camera* coordinates.
    Returns (E [3, 3], inlier mask [N]) maximizing Sampson-distance inliers.
    """
    N = x1n.shape[0]
    assert N >= 8, "need at least 8 correspondences"
    rng = np.random.default_rng(seed)
    h1 = np.concatenate([x1n, np.ones((N, 1))], 1)
    h2 = np.concatenate([x2n, np.ones((N, 1))], 1)

    def fit(idx):
        a1, a2 = h1[idx], h2[idx]
        # x2^T E x1 = 0 -> A vec(E) = 0
        A = (a2[:, :, None] * a1[:, None, :]).reshape(len(idx), 9)
        _, _, Vt = np.linalg.svd(A)
        E = Vt[-1].reshape(3, 3)
        # project to the essential manifold: singular values (1, 1, 0)
        U, _, Vt = np.linalg.svd(E)
        return U @ np.diag([1.0, 1.0, 0.0]) @ Vt

    def sampson(E):
        Ex1 = h1 @ E.T                     # [N, 3] rows E x1
        Etx2 = h2 @ E                      # [N, 3] rows E^T x2
        num = np.sum(h2 * Ex1, 1) ** 2
        den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + \
            Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
        return num / np.maximum(den, 1e-12)

    best, best_in = None, None
    for _ in range(iters):
        idx = rng.choice(N, 8, replace=False)
        E = fit(idx)
        inl = sampson(E) < thresh
        if best_in is None or inl.sum() > best_in.sum():
            best, best_in = E, inl
    if best_in.sum() >= 8:                 # refit on all inliers
        best = fit(np.where(best_in)[0])
        best_in = sampson(best) < thresh
    return best, best_in


def triangulate_midpoint(R, t, x1n, x2n):
    """Midpoint triangulation in frame-1 coordinates.

    Camera 1 at origin; camera 2 with x2 = R x1 + t. Rays: d1 = [x1n, 1],
    d2 = R^T [x2n, 1] from center c2 = -R^T t. Returns [N, 3] points.
    """
    N = x1n.shape[0]
    d1 = np.concatenate([x1n, np.ones((N, 1))], 1)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 = np.concatenate([x2n, np.ones((N, 1))], 1) @ R   # rows: R^T d
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    c2 = -R.T @ t
    # solve [a -b; -b c] [t1, t2] = [d1.c2, -d2.c2] for closest ray points
    b = np.sum(d1 * d2, 1)
    rhs1 = d1 @ c2
    rhs2 = d2 @ c2
    den = np.maximum(1.0 - b * b, 1e-12)
    t1 = (rhs1 - b * rhs2) / den
    t2 = (b * rhs1 - rhs2) / den
    p = d1 * t1[:, None]
    q = c2[None, :] + d2 * t2[:, None]
    return 0.5 * (p + q)


def recover_pose(E, x1n, x2n):
    """Resolve the four (R, t) decompositions of E by cheirality voting.

    Returns (R, t_unit, pts3d_frame1) for the winning hypothesis, where
    x2 = R x1 + t and |t| = 1.
    """
    U, _, Vt = np.linalg.svd(E)
    if np.linalg.det(U) < 0:
        U = -U
    if np.linalg.det(Vt) < 0:
        Vt = -Vt
    W = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    cands = [(U @ W @ Vt, U[:, 2]), (U @ W @ Vt, -U[:, 2]),
             (U @ W.T @ Vt, U[:, 2]), (U @ W.T @ Vt, -U[:, 2])]
    best = None
    for R, t in cands:
        X = triangulate_midpoint(R, t, x1n, x2n)
        z2 = X @ R.T[:, 2] + t[2]          # depth in camera 2
        score = int(np.sum((X[:, 2] > 0) & (z2 > 0)))
        if best is None or score > best[0]:
            best = (score, R, t, X)
    _, R, t, X = best
    return R, t, X


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
                             seed=0, tracks=None):
    """Classical first-frame-anchored bootstrap over the given frames.

    images: [K][H, W, 3] uint8 (or None when `tracks` is supplied);
    intrinsics: [4] (fx, fy, cx, cy) full resolution;
    tracks: optional precomputed (grid_xy, tracks, ok) from `track_grid`
    (lets callers plug their own matcher, and tests feed exact synthetic
    correspondences).

    Returns (depths [K, H, W] float32, poses_c2w [K, 4, 4] float32) with
    frame 0 = identity and the global scale anchored so the (0, 1) pair's
    median frame-0 depth is 1. Mirrors the contract of
    `dpvo_mast3r_initialization` (`dpvo_mast3r_init.py:45-73`).
    """
    fx, fy, cx, cy = [float(v) for v in np.asarray(intrinsics).reshape(-1)[:4]]
    if tracks is None:
        grid, tr, ok = track_grid(images, stride=stride)
        H, W = images[0].shape[:2]
    else:
        grid, tr, ok = tracks
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
    geometric fallback (this image has zero egress and no mast3r)."""
    try:
        import dust3r  # noqa: F401
        import mast3r  # noqa: F401
    except Exception:
        return geometric_initialization(images, intrinsics, **kw)
    # External-model path: first-frame anchored global alignment
    # (`dpvo_mast3r_init.py:45-73`). Exercised only where mast3r exists.
    from dust3r.cloud_opt import GlobalAlignerMode, global_aligner
    from dust3r.image_pairs import make_pairs
    from dust3r.inference import inference, load_model
    from dust3r.utils.image import format_images
    import torch

    model = load_model(kw.get("checkpoint"), device=kw.get("device", "cpu"))
    imgs = format_images(list(images))
    pairs = make_pairs(imgs, scene_graph="complete", prefilter=None,
                       symmetrize=False)
    res = inference(pairs, model, kw.get("device", "cpu"), batch_size=1)
    scene = global_aligner(res, device=kw.get("device", "cpu"),
                           mode=GlobalAlignerMode.ModularPointCloudOptimizer)
    with torch.enable_grad():
        scene.compute_global_alignment(init="mst", niter=250,
                                       schedule="cosine", lr=0.01)
    depths = np.stack([np.asarray(d.detach().cpu())
                       for d in scene.get_depthmaps()])
    poses = np.stack([np.asarray(p.detach().cpu())
                      for p in scene.get_im_poses()])
    return depths.astype(np.float32), poses.astype(np.float32)


def bootstrap_slam(slam, images, intrinsics, **kw):
    """Run the bootstrap and inject its depths/poses into a DPVO instance
    (the frames must already be inserted). Mirrors the reference wiring of
    mast3r init -> `PatchGraph.init_from_prior`."""
    from .prior_init import anchor_first_frame, init_from_prior

    depths, poses_c2w = mast3r_initialization(images, intrinsics, **kw)
    init_from_prior(slam, depths, poses_c2w, range(len(images)))
    anchor_first_frame(slam)
    return depths, poses_c2w
