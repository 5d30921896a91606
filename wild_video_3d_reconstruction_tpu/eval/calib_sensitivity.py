"""Calibration-error -> end-to-end ATE sensitivity sweep (VERDICT r3 #9).

`init/colmap_init.py`'s self-contained auto-calibration carries a measured
2-15% focal-error envelope (tests/test_colmap_init.py). This driver maps
that envelope to a downstream cost: it tracks rendered scenes with the
SLAM FED focals off by 0/2/5/10/15% (ground truth and rendering keep the
true camera, `eval/synth_ate.py`) and reports Sim3 ATE per error level —
the quantity that decides when the gated pycolmap path
(`init/colmap_init.py:pycolmap_calibrate`) is REQUIRED rather than nice
to have. Reference context: the CUDA stack always has COLMAP-grade
intrinsics (`dpvo/dpvo_colmap_init.py:119-189`).

Run: python -u -m wild_video_3d_reconstruction_tpu.eval.calib_sensitivity \
        [--params checkpoints/synth_tpu_r3_step2000] [--trials 2]
Prints one JSON line; --markdown writes the table used in docs/ROUND4.md.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from . import synth_ate

LEVELS = (0.0, 0.02, 0.05, 0.10, 0.15)
SCENES = (("walk_s0", dict(path="walk", seed=0)),
          ("orbit_s0", dict(path="orbit", seed=0)))


def run_oracle(focal_err, frames=18, seed=0):
    """Oracle-flow SLAM rollout with miscalibrated intrinsics.

    The update network is replaced by ground-truth flow targets (exact
    pixel transfers from the renderer's analytic depth + poses), so the
    measured ATE isolates the GEOMETRIC cost of feeding BA focals off by
    (1 + focal_err) — no network noise. Targets are in pixels and
    therefore calibration-independent; only the back-projections inside
    BA/reprojection use the wrong focals, exactly like a miscalibrated
    `init/colmap_init.py` would."""
    import jax
    import jax.numpy as jnp

    from ..ops import lie
    from ..ops import projective as pops
    from ..slam import DPVO, steps
    from ..train.synth import render_clip
    from ..utils.config import DPVOConfig
    from . import metrics

    ht, wd = 96, 128
    rng = np.random.default_rng(seed)
    images, gt_w2c, disps, intr_true = render_clip(
        rng, frames=frames, ht=ht, wd=wd, fx=wd * 0.6, fy=wd * 0.6,
        n_planes=3)
    gt_poses = jnp.asarray(gt_w2c)
    disps_j = jnp.asarray(disps)            # [T, ht/4, wd/4] exact invdepth

    def oracle(cfg, params, state, net, ii, jj, kk, valid, n,
               order=None, kk_table=None, nbr=None):
        coords = pops.transform(state.poses, state.patches,
                                state.intrinsics, ii, jj, kk)
        coords = jnp.where(valid[:, None, None, None], coords, 0.0)
        xy = state.patches[kk][:, :2, 1, 1]            # [E, 2] at /4 grid
        gx = jnp.clip(xy[:, 0].astype(jnp.int32), 0, wd // 4 - 1)
        gy = jnp.clip(xy[:, 1].astype(jnp.int32), 0, ht // 4 - 1)
        d_true = disps_j[jnp.clip(ii, 0, frames - 1), gy, gx]
        # transfer with TRUE intrinsics + GT poses (full-res pixel math
        # expressed at the /4 scale the tracker uses)
        it = jnp.asarray(intr_true, jnp.float32) / 4.0
        patches_gt = jnp.concatenate(
            [xy[:, :, None, None] * jnp.ones((1, 1, 3, 3)),
             d_true[:, None, None, None] * jnp.ones((1, 1, 3, 3))], axis=1)
        gt_full = jnp.zeros_like(state.poses).at[:frames].set(gt_poses)
        intr_full = jnp.tile(it[None], (state.poses.shape[0], 1))
        target = pops.transform(gt_full, patches_gt, intr_full,
                                ii, jj, jnp.arange(ii.shape[0]))[:, 1, 1, :]
        delta = target - coords[:, 1, 1, :]
        weight = jnp.ones_like(delta) * valid[:, None]
        return net, delta, weight, coords

    orig = steps._run_update_net
    steps._run_update_net = oracle
    try:
        cfg = DPVOConfig(
            BUFFER_SIZE=64, PATCHES_PER_FRAME=8, REMOVAL_WINDOW=frames + 2,
            OPTIMIZATION_WINDOW=frames + 2, PATCH_LIFETIME=10,
            KEYFRAME_INDEX=2, KEYFRAME_THRESH=0.0, MEM=24,
            GRADIENT_BIAS=False, CORR_CHUNK=512, PALLAS_CORR=False)
        slam = DPVO(cfg, None, ht, wd, seed=0)
        slam._probe = lambda *a: 100.0
        intr_fed = np.asarray(intr_true, np.float64).copy()
        intr_fed[:2] *= (1.0 + focal_err)
        for t in range(frames):
            slam(t, images[t], intrinsics=intr_fed)
        slam.refine(40)
        poses_c2w, tstamps = slam.terminate()
        gt_c2w = np.asarray(lie.se3_inv(gt_poses))
        ate, _ = metrics.ate_rmse(poses_c2w, tstamps, gt_c2w,
                                  np.arange(frames, dtype=float))
        return float(ate)
    finally:
        steps._run_update_net = orig


def run_sweep(params=None, frames=60, trials=2, levels=LEVELS,
              scenes=SCENES, log=print):
    out = {}
    for sname, skw in scenes:
        row = {}
        for e in levels:
            runs = [synth_ate.run(params=params, frames=frames,
                                  slam_seed=s, focal_err=e, **skw)
                    for s in range(trials)]
            med = float(np.median([r["ate_rmse"] for r in runs]))
            row[f"{e:.2f}"] = med
            log(f"{sname:9s} focal_err {e:4.0%}: ATE median {med:.4f} "
                f"(floor {runs[0]['ate_floor_identity']:.3f})")
        out[sname] = row
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default=None)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--markdown", default=None)
    ap.add_argument("--oracle", action="store_true",
                    help="oracle-flow mode: isolates the geometric cost "
                         "of focal error (no network noise)")
    args = ap.parse_args()

    if args.oracle:
        table = {}
        for e in LEVELS:
            ates = [run_oracle(e, seed=s) for s in range(args.trials)]
            table[f"{e:.2f}"] = float(np.median(ates))
            print(f"oracle focal_err {e:4.0%}: ATE median "
                  f"{table[f'{e:.2f}']:.4f}  (trials {ates})")
        print(json.dumps({"metric": "calib_sensitivity_ate_oracle",
                          "levels": list(LEVELS), "table": table}))
        return

    params = None
    if args.params:
        import jax

        from ..models.vonet import init_vonet
        from ..train.trainer import load_checkpoint
        params = load_checkpoint(args.params,
                                 init_vonet(jax.random.PRNGKey(0)))

    table = run_sweep(params=params, frames=args.frames, trials=args.trials)
    res = {"metric": "calib_sensitivity_ate", "levels": list(LEVELS),
           "params": args.params or "random", "table": table}
    print(json.dumps(res))
    if args.markdown:
        lines = ["| scene | " + " | ".join(f"{e:.0%}" for e in LEVELS)
                 + " |", "|---" * (len(LEVELS) + 1) + "|"]
        for s, row in table.items():
            lines.append("| " + s + " | " +
                         " | ".join(f"{row[f'{e:.2f}']:.4f}"
                                    for e in LEVELS) + " |")
        with open(args.markdown, "w") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
