"""CLI demo driver — `python -m wild_video_3d_reconstruction_tpu.demo`.

Flag-compatible port of the reference `dpvo_demo.py:144-210`: stream frames
(images or video) with optional depth/mask directories, run the SLAM loop,
final refinement updates, then export trajectory / PLY / COLMAP.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np


def int_or_none(value):
    if value.lower() == "none":
        return None
    return int(value)


def run(cfg, network, imagedir, depthdir, maskdir, calib, stride=1, skip=0,
        end=None, timeit=False, path="./output", save_reconstruction=False,
        save_trajectory=False, export_colmap=False, plot=False,
        loop_enabled=False, viz=False, rerun=False, checkpoint_every=0,
        resume=None):

    from .io import export, stream
    from .slam import DPVO
    from .utils.timer import Timer, timing_summary

    if isinstance(network, str):
        # load once: DPVO and the auto-calibration matcher share the weights
        from .models import convert
        network = convert.load_torch_checkpoint(network)

    if calib is None:
        from .init.colmap_init import run_colmap_initialization
        calib = run_colmap_initialization(imagedir, path, skip,
                                          params=network)
    elif isinstance(calib, str):
        calib = np.loadtxt(calib, delimiter=" ")

    gen = stream.image_frames(imagedir, depthdir, maskdir, calib, stride,
                              skip, end) if os.path.isdir(imagedir) else \
        stream.video_frames(imagedir, calib, stride, skip)
    # device_upload: the prefetch thread stages frames on the chip so the
    # host->device copy overlaps the previous frame's compute. In loop-
    # closure mode frames stay HOST-side: the LC ingest keeps each frame
    # for the JPEG cache, and reading a device-staged frame back through
    # a relay-attached TPU costs ~80 ms/frame blocking (r5; DPVO also
    # pipelines such fetches async as a fallback, but not staging at all
    # is strictly better — the dispatch path batch-uploads per chunk).
    reader = stream.Prefetcher(gen, maxsize=8,
                               device_upload=not loop_enabled)

    slam = None
    visualizer = None
    n_seen = 0
    from tqdm import tqdm
    for t, image, depth, mask, intrinsics in tqdm(reader):
        if slam is None:
            ht, wd, _ = image.shape
            slam = DPVO(cfg, network, ht, wd, path=path,
                        sync_mode=True if (viz or rerun) else None)
            if loop_enabled or cfg.loop_enabled:
                from .loop.longterm import LongTermLoopClosure
                vlad = None
                if not getattr(cfg, "NETVLAD_CHECKPOINT", "") and \
                        os.path.isdir(imagedir):
                    # offline pre-pass (reference: dpvo_demo.py:94-99):
                    # fit the VLAD vocabulary on this sequence's features
                    import cv2
                    from .loop.netvlad import (VLADDescriptor,
                                               fit_centers_from_images)
                    files = stream.list_images(imagedir, stride, skip, end)
                    # evenly spaced across the whole sequence (files[::step]
                    # would take a contiguous head for 25-47 images)
                    k = min(24, len(files))
                    picks = [files[int(i * len(files) / k)]
                             for i in range(k)]
                    imgs = [im for im in (cv2.imread(str(f)) for f in picks)
                            if im is not None]
                    if len(calib) > 4:
                        # match the online path: stream.image_frames
                        # undistorts before feature extraction
                        K = np.array([[calib[0], 0, calib[2]],
                                      [0, calib[1], calib[3]],
                                      [0, 0, 1]])
                        imgs = [cv2.undistort(im, K, calib[4:])
                                for im in imgs]
                    if imgs:
                        centers = fit_centers_from_images(slam.params, imgs)
                        vlad = VLADDescriptor(centers=centers)
                slam.loop_closure = LongTermLoopClosure(cfg, slam,
                                                        vlad=vlad)
            if viz or rerun:
                from .utils.viz import Visualizer
                visualizer = Visualizer(slam, path=f"{path}/viz",
                                        use_rerun=rerun)
            if resume:
                from .slam.checkpoint import load_slam
                load_slam(slam, resume)
                print(f"resumed from {resume} at frame {slam.counter}")
        n_seen += 1
        if resume and n_seen <= slam.counter:
            continue                     # skip frames the snapshot covers
        if checkpoint_every and slam.counter and \
                slam.counter % checkpoint_every == 0:
            from .slam.checkpoint import save_slam
            save_slam(slam, f"{path}/slam_ckpt")
        with Timer("SLAM", enabled=timeit,
                   sync=(lambda: slam.state.poses) if timeit else None):
            slam(t, image, depth, mask, intrinsics)
        if visualizer is not None and slam.is_initialized and t % 4 == 0:
            visualizer.update(image=image)

    for _ in range(12):
        slam.refine(1)

    points, colors = slam.points_and_colors()
    poses, tstamps = slam.terminate()
    if timeit:
        timing_summary()

    Path(path).mkdir(parents=True, exist_ok=True)
    name = Path(imagedir).stem
    if save_reconstruction:
        export.save_ply(Path(path) / f"{name}.ply", points, colors)
        print(f"Saved {path}/{name}.ply")
    if save_trajectory:
        Path(f"{path}/saved_trajectories").mkdir(exist_ok=True, parents=True)
        export.save_trajectory_tum_format(
            poses, tstamps, f"{path}/saved_trajectories/{name}.txt")
    if plot:
        Path(f"{path}/trajectory_plots").mkdir(exist_ok=True, parents=True)
        export.plot_trajectory(poses, title=f"DPVO Trajectory for {name}",
                               filename=f"{path}/trajectory_plots/{name}.pdf")
    if export_colmap:
        fx, fy, cx, cy = np.asarray(calib)[:4]
        export.save_output_for_colmap(
            f"{path}/colmap_{name}", poses, tstamps, points, colors,
            fx, fy, cx, cy, slam.ht, slam.wd)
        with open(f"{path}/config.yaml", "w") as f:
            f.write(cfg.dump())
    return poses, tstamps, (points, colors)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--network", type=str,
                        default="checkpoints/dpvo.pth")
    parser.add_argument("--imagedir", type=str, required=True)
    parser.add_argument("--depthdir", type=str, default=None)
    parser.add_argument("--maskdir", type=str, default=None)
    parser.add_argument("--calib", type=str, default=None)
    parser.add_argument("--path", type=str, default="./output")
    parser.add_argument("--buffer", type=int, default=2048)
    parser.add_argument("--config", default="configs/default.yaml")
    parser.add_argument("--stride", type=int, default=2)
    parser.add_argument("--skip", type=int, default=0)
    parser.add_argument("--end", type=int_or_none, default=None)
    parser.add_argument("--timeit", action="store_true")
    parser.add_argument("--viz", action="store_true")
    parser.add_argument("--rerun", action="store_true")
    parser.add_argument("--loop_enabled", action="store_true")
    parser.add_argument("--save_reconstruction", action="store_true")
    parser.add_argument("--save_trajectory", action="store_true")
    parser.add_argument("--export_colmap", action="store_true")
    parser.add_argument("--plot", action="store_true")
    parser.add_argument("--set_seed", type=int, default=0)
    parser.add_argument("--checkpoint_every", type=int, default=0,
                        help="snapshot SLAM state every N frames")
    parser.add_argument("--resume", type=str, default=None,
                        help="resume from a slam_ckpt directory")
    parser.add_argument("--opts", nargs="+", default=[])
    args = parser.parse_args(argv)

    from .utils.config import load_config
    from .utils.resources import resource_path

    config = resource_path(args.config)
    cfg = load_config(config if os.path.exists(config) else None)
    cfg = cfg.merge_from_dict({"BUFFER_SIZE": args.buffer,
                               "loop_enabled": args.loop_enabled})
    if args.opts:
        cfg = cfg.merge_from_list(args.opts)
    print(cfg.dump())

    args.calib = resource_path(args.calib)
    network = resource_path(args.network)
    network = network if os.path.exists(network) else None
    if network is None:
        print(f"WARNING: checkpoint {args.network} not found; "
              "using random weights")
    run(cfg, network, args.imagedir, args.depthdir, args.maskdir, args.calib,
        stride=args.stride, skip=args.skip, end=args.end, timeit=args.timeit,
        path=args.path, save_reconstruction=args.save_reconstruction,
        save_trajectory=args.save_trajectory,
        export_colmap=args.export_colmap, plot=args.plot,
        loop_enabled=args.loop_enabled, viz=args.viz, rerun=args.rerun,
        checkpoint_every=args.checkpoint_every, resume=args.resume)


if __name__ == "__main__":
    main()
