"""Full-SLAM trajectory accuracy on a rendered synthetic sequence.

Runs the actual tracker (`slam.DPVO`, the same code path as the demo CLI)
on a `train/synth.py` rendered sequence with known ground-truth poses and
reports Sim3-aligned ATE RMSE — the evaluation protocol of
`evaluation/dpvo_eva_tum.py:144-197` with a rendered scene standing in
for TUM (the zero-egress image has no datasets). Use --params to evaluate
weights trained by `eval.learn_synth`; default compares against random
initialization.

Run: python -u -m wild_video_3d_reconstruction_tpu.eval.synth_ate \
         [--params /tmp/synth_params/step_300] [--frames 60]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def run(params=None, frames=60, ht=48, wd=64, seed=0, probe_stub=True,
        path="walk", slam_seed=0, focal_err=0.0):
    import jax
    import jax.numpy as jnp

    from ..slam import DPVO
    from ..train.synth import render_sequence
    from ..utils.config import DPVOConfig
    from . import metrics

    images, poses_gt_w2c, intr = render_sequence(seed, frames=frames,
                                                 ht=ht, wd=wd, path=path)
    cfg = DPVOConfig(
        BUFFER_SIZE=max(frames + 8, 64), PATCHES_PER_FRAME=16,
        REMOVAL_WINDOW=8, OPTIMIZATION_WINDOW=6, PATCH_LIFETIME=5,
        KEYFRAME_INDEX=2, MEM=16, GRADIENT_BIAS=False, PALLAS_CORR=False,
        CORR_CHUNK=1024, DEPTH_INIT="median",
        MOTION_PROBE_THRESH=-1.0 if probe_stub else 2.0)
    slam = DPVO(cfg, params, ht, wd, seed=slam_seed)

    # calibration-error injection (eval/calib_sensitivity.py): the SLAM is
    # FED focals off by (1 + focal_err) while ground truth / rendering use
    # the true camera — models a miscalibrated `init/colmap_init.py`
    intr_fed = np.asarray(intr, np.float64).copy()
    intr_fed[:2] *= (1.0 + focal_err)

    for t in range(frames):
        slam(t, images[t], intrinsics=intr_fed)
    est, tstamps = slam.terminate()

    from ..ops import lie
    gt_c2w = np.asarray(lie.se3_inv(jnp.asarray(poses_gt_w2c)))
    ate, n = metrics.ate_rmse(est, tstamps, gt_c2w,
                              np.arange(frames, dtype=np.float64))
    ident = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0]), (frames, 1))
    floor, _ = metrics.ate_rmse(ident, np.arange(frames, dtype=np.float64),
                                gt_c2w, np.arange(frames,
                                                  dtype=np.float64))
    return {"ate_rmse": float(ate), "ate_floor_identity": float(floor),
            "n_aligned": int(n), "n_keyframes": int(slam.n_host)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", type=str, default=None,
                    help="orbax checkpoint dir from eval.learn_synth")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--trials", type=int, default=1)
    ap.add_argument("--path", choices=["walk", "orbit"], default="walk")
    args = ap.parse_args()

    params = None
    if args.params:
        import jax

        from ..models.vonet import init_vonet
        from ..train.trainer import load_checkpoint

        params = load_checkpoint(args.params,
                                 init_vonet(jax.random.PRNGKey(0)))

    results = [run(params=params, frames=args.frames, seed=args.seed + i,
                   path=args.path)
               for i in range(args.trials)]
    out = {
        "metric": "synth_ate",
        "path": args.path,
        "params": args.params or "random",
        "ate_rmse_median": float(np.median([r["ate_rmse"]
                                            for r in results])),
        "trials": results,
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
