"""Full wild-video-3d-reconstruction pipeline on a rendered sequence.

The reference repo's headline capability is video -> DPVO SLAM -> COLMAP
export -> nerfstudio prepare -> NeRF training (`dpvo_demo.py` ->
`plot_utils.save_output_for_COLMAP` -> `nerf_train/nerf_prepare.py` ->
`nerf_train/nerf_train.py`). This driver runs the ENTIRE rebuilt chain
end to end, in-process, on a rendered synthetic sequence with known
ground truth (the zero-egress image has no real video):

  1. render a multi-plane world sequence to PNG frames on disk;
  2. run the real demo driver (`demo.run`) over the image directory —
     the exact user entry point — with `export_colmap` on;
  3. run the NeRF prepare stage on the exported binary COLMAP model
     (`nerf/prepare.generate_nf_transform`, OpenCV->OpenGL);
  4. train the native instant-NGP field on the resulting
     transforms.json (`nerf/train_native`) and report held-out PSNR;
  5. report SLAM Sim3 ATE against the renderer's ground-truth poses.

Run: python -u -m wild_video_3d_reconstruction_tpu.eval.recon_e2e \
         [--params /tmp/synth_params/step_300] [--frames 40]
Prints one JSON line: {"metric": "recon_e2e", "ate_rmse": ..,
"psnr": .., ...}.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def run(params=None, frames=40, ht=48, wd=64, seed=0, nerf_steps=400,
        workdir=None, path="walk", refine=True):
    import cv2
    import jax
    import jax.numpy as jnp

    from .. import demo
    from ..nerf import prepare, train_native
    from ..ops import lie
    from ..train.synth import render_sequence
    from ..utils.config import DPVOConfig
    from . import metrics

    import tempfile
    if workdir is None:
        workdir = tempfile.mkdtemp(prefix="recon_e2e_")
    workdir = Path(workdir)
    imagedir = workdir / "images"
    imagedir.mkdir(parents=True, exist_ok=True)

    # 1. render the world to disk exactly as a user's frame dir
    images, poses_gt_w2c, intr = render_sequence(seed, frames=frames,
                                                 ht=ht, wd=wd, path=path)
    for t in range(frames):
        cv2.imwrite(str(imagedir / f"frame_{t:06d}.png"),
                    cv2.cvtColor(images[t], cv2.COLOR_RGB2BGR))

    # 2. the genuine demo entry point (stride 1; synthetic scenes are
    #    too short to skip frames)
    cfg = DPVOConfig(
        BUFFER_SIZE=max(frames + 8, 64), PATCHES_PER_FRAME=16,
        REMOVAL_WINDOW=8, OPTIMIZATION_WINDOW=6, PATCH_LIFETIME=5,
        KEYFRAME_INDEX=2, MEM=16, GRADIENT_BIAS=False, PALLAS_CORR=False,
        CORR_CHUNK=1024, DEPTH_INIT="median", MOTION_PROBE_THRESH=-1.0)
    out = workdir / "output"
    poses, tstamps, (points, colors) = demo.run(
        cfg, params, str(imagedir), None, None,
        np.asarray(intr, np.float64), stride=1, path=str(out),
        save_trajectory=True, export_colmap=True)

    # 3. the reference's prepare stage over the exported binary model
    recon = out / "colmap_images" / "colmap" / "sparse" / "0"
    nerf_dir = out / "nerf"
    prepare.generate_nf_transform(recon, nerf_dir,
                                  image_dir="../../images")

    # 4. native NGP training on the prepared data; pose refinement is on
    #    by default because the poses come from SLAM, not SfM
    data = train_native.load_transforms(nerf_dir)
    if refine:
        _, _, rep = train_native.train_refine(
            *data, steps=nerf_steps, batch=2048, n_coarse=32, n_fine=24,
            table_size=2 ** 13, eval_every=nerf_steps, eval_align=True)
    else:
        _, _, rep = train_native.train(*data, steps=nerf_steps,
                                       batch=2048, n_samples=48,
                                       table_size=2 ** 13,
                                       eval_every=nerf_steps)

    # 5. trajectory accuracy vs the renderer's ground truth
    gt_c2w = np.asarray(lie.se3_inv(jnp.asarray(poses_gt_w2c)))
    ate, n = metrics.ate_rmse(poses, tstamps, gt_c2w,
                              np.arange(frames, dtype=np.float64))

    return {"metric": "recon_e2e", "frames": frames,
            "ate_rmse": float(ate), "n_aligned": int(n),
            "psnr_init": rep["psnr_init"], "psnr": rep["psnr"],
            "psnr_aligned": rep.get("psnr_aligned"),
            "refine": bool(refine),
            "pose_delta_rms": rep.get("pose_delta_rms"),
            "nerf_steps": nerf_steps, "workdir": str(workdir)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", type=str, default=None,
                    help="orbax checkpoint dir from eval.learn_synth")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--nerf_steps", type=int, default=400)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--path", choices=["walk", "orbit"], default="walk")
    ap.add_argument("--workdir", type=str, default=None)
    ap.add_argument("--no_refine", action="store_true",
                    help="plain NGP trainer instead of the refined one")
    args = ap.parse_args()

    params = None
    if args.params:
        import jax

        from ..models.vonet import init_vonet
        from ..train.trainer import load_checkpoint

        params = load_checkpoint(args.params,
                                 init_vonet(jax.random.PRNGKey(0)))

    rep = run(params=params, frames=args.frames, seed=args.seed,
              nerf_steps=args.nerf_steps, workdir=args.workdir,
              path=args.path, refine=not args.no_refine)
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
