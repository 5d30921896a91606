"""Automatic camera calibration when no calib file is given.

Counterpart of the reference's COLMAP bootstrap
(`dpvo/dpvo_colmap_init.py:49-420`): select ~50 sharp, well-separated
warm-up frames by optical-flow magnitude + Laplacian sharpness, then
recover pinhole intrinsics. The reference shells out to
deep_image_matching + pycolmap/GLOMAP; this rebuild is self-contained:

  * frame selection: Farneback flow (threshold 2.0 px mean at 512-wide
    scale) and Laplacian-variance sharpness, as the reference
    (`dpvo_colmap_init.py:208-284`),
  * matching: the framework's own Shi-Tomasi + feature-map descriptors +
    mutual-NN matcher (`loop.keypoints`),
  * intrinsics: focal grid search maximizing essential-matrix inlier
    consistency over the selected pairs (principal point at the image
    center); a classical self-calibration that needs no SfM binary.
  * if pycolmap happens to be installed, it is preferred (gated import),
    matching the reference toolchain.
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np


def select_keyframes(imagedir, skip=0, max_frames=50, flow_thresh=2.0,
                     sharp_frac=0.75):
    """Greedy flow-gap + sharpness frame selection
    (`dpvo_colmap_init.py:208-284`)."""
    from ..io.stream import _globbed, IMG_EXTS

    files = _globbed(imagedir, IMG_EXTS, skip, None, 1)
    if not files:
        raise FileNotFoundError(f"no images in {imagedir}")
    selected = []
    prev_gray = None
    for f in files:
        img = cv2.imread(str(f), cv2.IMREAD_COLOR)
        h, w = img.shape[:2]
        scale = 512.0 / max(h, w)
        small = cv2.resize(img, None, fx=scale, fy=scale)
        gray = cv2.cvtColor(small, cv2.COLOR_BGR2GRAY)
        if prev_gray is None:
            take = True
        else:
            flow = cv2.calcOpticalFlowFarneback(
                prev_gray, gray, None, 0.5, 3, 15, 3, 5, 1.2, 0)
            take = np.linalg.norm(flow, axis=2).mean() > flow_thresh
        if take:
            sharp = cv2.Laplacian(gray, cv2.CV_64F).var()
            selected.append((str(f), sharp))
            prev_gray = gray
        if len(selected) >= int(max_frames / sharp_frac):
            break
    # keep the sharpest fraction, preserving temporal order
    if len(selected) > max_frames:
        thresh = np.quantile([s for _, s in selected], 1 - sharp_frac)
        selected = [(f, s) for f, s in selected if s >= thresh][:max_frames]
    return [f for f, _ in selected]


def _match_pairs(frames, params=None, max_kpts=1024):
    """Keypoints + mutual-NN matches between consecutive selected frames.

    params: trained VONet params — the fmap descriptors are only meaningful
    with real weights; random init is a last-resort fallback for tests."""
    import jax
    import jax.numpy as jnp

    from ..loop import keypoints as kp
    from ..models.vonet import encode_frame, init_vonet

    if params is None:
        params = init_vonet(jax.random.PRNGKey(0))
    enc = jax.jit(lambda p, im: encode_frame(p, im, jnp.float32).fmap)

    feats = []
    for f in frames:
        img = cv2.imread(f, cv2.IMREAD_COLOR)
        h, w = img.shape[:2]
        img = img[:h - h % 16, :w - w % 16]
        fmap = enc(params, jnp.asarray(img))
        xy, score = kp.detect(jnp.asarray(img), max_kpts)
        desc = kp.describe(fmap, xy)
        feats.append((np.asarray(xy), np.asarray(score) > 0, desc,
                      img.shape[:2]))

    pairs = []
    for a, b in zip(feats[:-1], feats[1:]):
        i0, i1, ok = kp.match(a[2], b[2], jnp.asarray(a[1]),
                              jnp.asarray(b[1]))
        ok = np.asarray(ok)
        pairs.append((a[0][np.asarray(i0)[ok]], b[0][np.asarray(i1)[ok]]))
    return pairs, feats[0][3]


def estimate_focal(pairs, hw, focal_grid=None):
    """Grid-search the focal length maximizing essential-matrix support.

    For the correct focal, E = K^T F K satisfies the essential constraints
    and RANSAC inlier counts peak; a standard self-calibration heuristic.
    """
    h, w = hw
    cx, cy = w / 2.0, h / 2.0
    if focal_grid is None:
        base = max(h, w)
        focal_grid = np.linspace(0.5, 2.5, 21) * base

    best_f, best_score = focal_grid[0], -1.0
    for f in focal_grid:
        K = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1.0]])
        score = 0.0
        for p0, p1 in pairs:
            if len(p0) < 12:
                continue
            E, inl = cv2.findEssentialMat(
                p0.astype(np.float64), p1.astype(np.float64), K,
                method=cv2.RANSAC, prob=0.999, threshold=1.5)
            if E is None or inl is None:
                continue
            n_in = int(inl.sum())
            if n_in < 10:
                continue
            # cheirality check strengthens the focal signal
            _, R, t, mask = cv2.recoverPose(
                E, p0.astype(np.float64), p1.astype(np.float64), K,
                mask=inl.copy())
            score += float(mask.sum()) / max(len(p0), 1)
        if score > best_score:
            best_score, best_f = score, float(f)
    return best_f, cx, cy


def _try_pycolmap(frames, workdir):
    """Incremental SfM via pycolmap when installed (the reference's primary
    path, `dpvo_colmap_init.py:119-159`). Returns [fx, fy, cx, cy] or None;
    mirrors the reference's >=70% registration-rate acceptance check."""
    try:
        import pycolmap
    except ImportError:
        return None
    import shutil
    import tempfile

    tmp = Path(workdir or tempfile.mkdtemp(prefix="sfm_"))
    imgdir = tmp / "images"
    imgdir.mkdir(parents=True, exist_ok=True)
    for f in frames:
        shutil.copy(f, imgdir / Path(f).name)
    db = tmp / "database.db"
    out = tmp / "sparse"
    out.mkdir(exist_ok=True)
    try:
        pycolmap.extract_features(db, imgdir)
        pycolmap.match_sequential(db)
        recs = pycolmap.incremental_mapping(db, imgdir, out)
        if not recs:
            return None
        rec = max(recs.values(), key=lambda r: len(r.images))
        if len(rec.images) < 0.7 * len(frames):
            print(f"pycolmap registered {len(rec.images)}/{len(frames)} "
                  "frames (<70%) — falling back to focal grid search")
            return None
        cam = next(iter(rec.cameras.values()))
        p = cam.params
        if len(p) == 3:                       # SIMPLE_PINHOLE/SIMPLE_RADIAL
            return np.array([p[0], p[0], p[1], p[2]])
        return np.array(p[:4])
    except Exception as e:                    # noqa: BLE001 — fallback chain
        print(f"pycolmap initialization failed ({e}); using grid search")
        return None


def run_colmap_initialization(imagedir, path=None, skip=0, max_frames=30,
                              params=None):
    """API-compatible entry (`dpvo_colmap_init.py:191`): returns
    np.array([fx, fy, cx, cy]). params: trained VONet weights for the
    descriptor matcher (the demo passes its loaded checkpoint)."""
    frames = select_keyframes(imagedir, skip=skip, max_frames=max_frames)
    if len(frames) < 2:
        raise RuntimeError("not enough frames with motion for calibration")

    calib = _try_pycolmap(frames, path)
    if calib is not None:
        if path:
            Path(path).mkdir(parents=True, exist_ok=True)
            np.savetxt(Path(path) / "estimated_calib.txt", calib[None])
        return calib

    pairs, hw = _match_pairs(frames, params=params)
    f, cx, cy = estimate_focal(pairs, hw)
    calib = np.array([f, f, cx, cy])
    if path:
        Path(path).mkdir(parents=True, exist_ok=True)
        np.savetxt(Path(path) / "estimated_calib.txt", calib[None])
    print(f"auto-calibration: fx=fy={f:.1f}, cx={cx:.1f}, cy={cy:.1f}")
    return calib
