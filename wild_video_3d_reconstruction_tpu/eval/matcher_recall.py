"""Loop-closure keypoint-matcher precision/recall vs ground truth
(VERDICT r3 #4).

The reference's loop closure matches DISK keypoints with LightGlue
(`dpvo/loop_closure/long_term.py:45-63,84-89`); this stack ships
Shi-Tomasi + fnet-descriptor mutual-NN with ratio test
(`loop/keypoints.py`). This driver scores that matcher against EXACT
ground-truth correspondences on the hardened synthetic worlds (analytic
depth + known poses -> closed-form pixel transfer; occluder discs and
exposure jitter emulate in-the-wild nuisances), across viewpoint deltas.

Metrics per (delta, harden):
  precision  = correct accepted matches / accepted matches
  recall     = correct accepted matches / matchable GT pairs, where a GT
               pair exists when an A-keypoint's transfer lands within
               `tol` px of some detected B-keypoint and passes the
               occlusion/depth-consistency check.

Run: python -u -m wild_video_3d_reconstruction_tpu.eval.matcher_recall \
        [--params checkpoints/synth_tpu_r3_step2000] [--seeds 4]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

import jax
import jax.numpy as jnp

from ..loop import keypoints as kp
from ..models import vonet
from ..ops import lie
from ..train.synth import render_clip

DELTAS = (1, 3, 6, 10)
TOL = 3.0          # px at full resolution
NKPT = 512


def _transfer(xy, invd, pose_a, pose_b, intr):
    """Project full-res pixels xy [K, 2] of frame a (inverse depth invd)
    into frame b. Returns (xy_b [K, 2], z_b [K])."""
    fx, fy, cx, cy = intr
    X = np.stack([(xy[:, 0] - cx) / fx, (xy[:, 1] - cy) / fy,
                  np.ones(len(xy)), invd], axis=-1)
    Gab = np.asarray(lie.se3_mul(jnp.asarray(pose_b),
                                 lie.se3_inv(jnp.asarray(pose_a))))
    Xb = np.asarray(lie.se3_act4(jnp.asarray(np.tile(Gab, (len(xy), 1))),
                                 jnp.asarray(X, jnp.float32)))
    z = Xb[:, 2] / np.maximum(Xb[:, 3], 1e-8)
    xb = fx * Xb[:, 0] / np.maximum(Xb[:, 2], 1e-8) + cx
    yb = fy * Xb[:, 1] / np.maximum(Xb[:, 2], 1e-8) + cy
    return np.stack([xb, yb], axis=-1), z


def run_pair(images, poses, disps, intr, a, b, params, tol=TOL):
    """Score the matcher on the (a, b) frame pair. Returns metric dict."""
    ht, wd = images.shape[1:3]
    enc = lambda im: np.asarray(vonet.encode_frame(  # noqa: E731
        params, jnp.asarray(im), jnp.float32).fmap)
    feats = []
    for t in (a, b):
        xy, score = kp.detect(jnp.asarray(images[t]), NKPT)
        desc = kp.describe(jnp.asarray(enc(images[t])), xy)
        feats.append(dict(xy=np.asarray(xy), score=np.asarray(score),
                          desc=desc, valid=np.asarray(score) > 0))
    fa, fb = feats

    # ground-truth transfer of frame-a keypoints (disp at /4 grid)
    gx = np.clip((fa["xy"][:, 0] / 4).astype(int), 0, wd // 4 - 1)
    gy = np.clip((fa["xy"][:, 1] / 4).astype(int), 0, ht // 4 - 1)
    invd = disps[a][gy, gx]
    xy_b, z_b = _transfer(fa["xy"], invd, poses[a], poses[b],
                          intr)
    inb = ((xy_b[:, 0] >= 0) & (xy_b[:, 0] < wd)
           & (xy_b[:, 1] >= 0) & (xy_b[:, 1] < ht) & (z_b > 1e-3))
    # occlusion / moving-occluder check: the b-frame depth at the
    # transfer location must agree with the transferred depth
    bx = np.clip((xy_b[:, 0] / 4).astype(int), 0, wd // 4 - 1)
    by = np.clip((xy_b[:, 1] / 4).astype(int), 0, ht // 4 - 1)
    invd_b = disps[b][by, bx]
    vis = inb & fa["valid"] & (np.abs(1.0 / np.maximum(z_b, 1e-6)
                                      - invd_b)
                               < 0.15 * np.maximum(invd_b, 1e-6))

    # matchable = a detected b keypoint sits within tol of the transfer
    d2 = np.linalg.norm(xy_b[:, None, :] - fb["xy"][None, :, :], axis=-1)
    d2[:, ~fb["valid"]] = 1e9
    nearest_b = d2.argmin(axis=1)
    matchable = vis & (d2[np.arange(len(xy_b)), nearest_b] < tol)

    i0, i1, ok = kp.match(jnp.asarray(fa["desc"]), jnp.asarray(fb["desc"]),
                          jnp.asarray(fa["valid"]), jnp.asarray(fb["valid"]))
    i0, i1, ok = map(np.asarray, (i0, i1, ok))
    acc_a, acc_b = i0[ok], i1[ok]
    err = np.linalg.norm(fb["xy"][acc_b] - xy_b[acc_a], axis=-1)
    # precision scores reprojection error alone among in-bounds transfers
    # (an accepted match that is geometrically right but fails the /4-grid
    # depth-consistency gate is NOT a false positive — ADVICE r4); the vis
    # gate only shapes the recall denominator (what was matchABLE).
    geo_ok = (err < tol) & inb[acc_a]
    correct_rec = (err < tol) & vis[acc_a]
    n_acc = int(ok.sum())
    n_matchable = int(matchable.sum())
    n_correct = int(correct_rec.sum())
    return dict(accepted=n_acc, matchable=n_matchable, correct=n_correct,
                geo_correct=int(geo_ok.sum()),
                precision=int(geo_ok.sum()) / max(n_acc, 1),
                recall=n_correct / max(n_matchable, 1))


def run_sweep(params, seeds=4, deltas=DELTAS, ht=96, wd=128, log=print):
    out = {}
    for harden in (False, True):
        for d in deltas:
            agg = dict(accepted=0, matchable=0, correct=0, geo_correct=0)
            for s in range(seeds):
                rng = np.random.default_rng(1000 + s)
                images, poses, disps, intr = render_clip(
                    rng, frames=max(deltas) + 1, ht=ht, wd=wd,
                    fx=wd * 0.6, fy=wd * 0.6, n_planes=3, harden=harden)
                r = run_pair(images, poses, disps, intr, 0, d, params)
                for k in agg:
                    agg[k] += r[k]
            prec = agg["geo_correct"] / max(agg["accepted"], 1)
            rec = agg["correct"] / max(agg["matchable"], 1)
            key = f"{'hard' if harden else 'clean'}_d{d}"
            out[key] = dict(precision=round(prec, 3), recall=round(rec, 3),
                            **agg)
            log(f"{key:10s} precision {prec:.3f} recall {rec:.3f} "
                f"(acc {agg['accepted']}, matchable {agg['matchable']})")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default=None)
    ap.add_argument("--seeds", type=int, default=4)
    args = ap.parse_args()

    from ..models.vonet import init_vonet
    if args.params:
        from ..train.trainer import load_checkpoint
        params = load_checkpoint(args.params,
                                 init_vonet(jax.random.PRNGKey(0)))
    else:
        params = init_vonet(jax.random.PRNGKey(0))

    table = run_sweep(params, seeds=args.seeds)
    print(json.dumps({"metric": "lc_matcher_pr",
                      "params": args.params or "random", "table": table}))


if __name__ == "__main__":
    main()
