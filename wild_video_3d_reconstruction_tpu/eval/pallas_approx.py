"""Quantify the Pallas correlation kernel's region approximation.

The kernel covers each edge's nine correlation windows with one 16x32
region; a reprojected patch whose pixel spread exceeds the region at some
pyramid level gets zero correlation for the offending pixels
(`ops/pallas_corr.py` module docstring). The reference CUDA kernel
(`dpvo/altcorr/correlation_kernel.cu:83-136`) samples each pixel
independently and has no such limit.

This driver measures, on a synthetic sequence with configurable motion
magnitude:
  1. the fraction of (edge, pixel, level) samples clipped by the region
     bound but inside the image (the approximation's true error surface);
  2. the end-to-end trajectory divergence between the Pallas path and the
     exact XLA oracle path on the same frames.

Usage:  python -m wild_video_3d_reconstruction_tpu.eval.pallas_approx \
            [--frames 60] [--shift 12] [--config configs/fast.yaml]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

import jax


def clip_stats(coords, shapes, valid):
    """Fraction of in-image pixels whose window leaves the kernel region.

    coords: [E, P, P, 2] at level-1 scale; shapes: [(H, W)] per level;
    valid: [E] bool. Mirrors the origin/in-region math of
    `ops.pallas_corr._pallas_corr_level` minus the image-bounds part
    (the oracle zeroes out-of-image windows too, so only in-image
    clipping is approximation error).
    """
    from ..ops.pallas_corr import PAD, RSH, RSW

    E = coords.shape[0]
    out = []
    for lvl, (H, W) in enumerate(shapes):
        c = coords / (4.0 ** lvl)
        pad_h = max(PAD, RSH - (H + PAD))
        pad_w = max(PAD, RSW - (W + PAD))
        Hp, Wp = H + PAD + pad_h, W + PAD + pad_w
        ystart = np.floor(c[..., 1]).astype(np.int64).reshape(E, -1) - 3 + PAD
        xstart = np.floor(c[..., 0]).astype(np.int64).reshape(E, -1) - 3 + PAD
        oy = np.clip(ystart.min(axis=1), 0, Hp - RSH)
        ox = np.clip((xstart.min(axis=1) // 16) * 16, 0, ((Wp - RSW) // 16) * 16)
        rel_y = ystart - oy[:, None]
        rel_x = xstart - ox[:, None]
        in_image = ((ystart >= 0) & (xstart >= 0) &
                    (ystart <= Hp - 8) & (xstart <= Wp - 8))
        in_region = ((rel_y >= 0) & (rel_y <= RSH - 8) &
                     (rel_x >= 0) & (rel_x <= RSW - 8))
        m = in_image & valid[:, None]
        n_considered = int(m.sum())
        n_clipped = int((m & ~in_region).sum())
        out.append((n_clipped, n_considered))
    return out


def run_vo(cfg, frames, intr, ht, wd):
    from ..slam import DPVO

    slam = DPVO(cfg, None, ht, wd, seed=0)
    slam._probe = lambda *a: 100.0
    for t, img in enumerate(frames):
        slam(t, img, intrinsics=intr)
    slam._replay_log()
    n = slam.n_host
    st = slam.state
    poses = np.asarray(st.poses[:n])
    coords = None
    if n > 2:
        from ..ops import projective as pops
        coords = np.asarray(pops.transform(
            st.poses, st.patches, st.intrinsics, st.ii, st.jj, st.kk))
    return poses, coords, np.asarray(st.valid), st


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/fast.yaml")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--shift", type=int, default=12,
                    help="pixel shift per frame (motion magnitude)")
    ap.add_argument("--size", type=int, nargs=2, default=(384, 512))
    args = ap.parse_args()

    from ..utils.config import load_config

    ht, wd = args.size
    rng = np.random.default_rng(0)
    big = rng.integers(0, 255, size=(ht + 1024, wd + 1024, 3), dtype=np.uint8)
    frames = []
    for t in range(args.frames):
        y = (args.shift * t) % 1024
        x = (args.shift * t * 2 // 3) % 1024
        frames.append(np.ascontiguousarray(big[y:y + ht, x:x + wd]))
    intr = np.array([wd * 0.8, wd * 0.8, wd / 2, ht / 2])

    results = {}
    for use_pallas in (True, False):
        cfg = load_config(args.config, BUFFER_SIZE=max(96, args.frames + 8),
                          PALLAS_CORR=use_pallas)
        poses, coords, valid, st = run_vo(cfg, frames, intr, ht, wd)
        results[use_pallas] = (poses, coords, valid, st)

    pp, cc, vv, st = results[True]
    po, _, _, _ = results[False]

    # clip statistics on the final edge set (live reprojection geometry)
    h4, w4 = ht // 4, wd // 4
    stats = clip_stats(cc, [(h4, w4), (h4 // 4, w4 // 4)], vv)
    for lvl, (n_clip, n_tot) in enumerate(stats):
        frac = n_clip / max(n_tot, 1)
        print(f"level {lvl}: clipped {n_clip}/{n_tot} "
              f"in-image samples ({100 * frac:.3f}%)")

    # trajectory divergence pallas vs oracle (translation RMSE after
    # removing the gauge: both paths start at identity)
    n = min(len(pp), len(po))
    d = pp[:n, :3] - po[:n, :3]
    scale = float(max(np.linalg.norm(po[:n, :3], axis=1).max(), 1e-9))
    rmse = float(np.sqrt((d ** 2).sum(axis=1).mean()))
    print(json.dumps({
        "metric": "pallas_vs_oracle_traj_rmse",
        "value": round(rmse, 6),
        "relative_to_traj_extent": round(rmse / scale, 6),
        "clip_frac_l0": round(stats[0][0] / max(stats[0][1], 1), 6),
        "clip_frac_l1": round(stats[1][0] / max(stats[1][1], 1), 6),
        "shift_px_per_frame": args.shift,
    }))


if __name__ == "__main__":
    main()
