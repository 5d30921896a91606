"""Dataset evaluation harnesses (TUM-RGBD fr1 and EuRoC).

Port of the reference's `evaluation/dpvo_eva_tum.py` / `dpvo_eva_euroc.py`
protocol: per-scene streaming with dataset-specific undistortion, N trials,
terminate + interpolate, Sim3-aligned ATE RMSE, per-scene medians and a
final table. Ground truth loading is evo-free (`eval.metrics`).

Run:
  python -m wild_video_3d_reconstruction_tpu.eval.harness tum \
      --datapath /data/TUM-RGBD --network checkpoints/dpvo.pth
"""

from __future__ import annotations

import argparse
from pathlib import Path

import cv2
import numpy as np

from ..utils.config import load_config
from . import metrics

TUM_FR1_SCENES = [
    "rgbd_dataset_freiburg1_360", "rgbd_dataset_freiburg1_desk",
    "rgbd_dataset_freiburg1_desk2", "rgbd_dataset_freiburg1_floor",
    "rgbd_dataset_freiburg1_plant", "rgbd_dataset_freiburg1_room",
    "rgbd_dataset_freiburg1_rpy", "rgbd_dataset_freiburg1_teddy",
    "rgbd_dataset_freiburg1_xyz",
]
EUROC_SCENES = [
    "MH_01_easy", "MH_02_easy", "MH_03_medium", "MH_04_difficult",
    "MH_05_difficult", "V1_01_easy", "V1_02_medium", "V1_03_difficult",
    "V2_01_easy", "V2_02_medium", "V2_03_difficult",
]

# TUM freiburg1 intrinsics + distortion (public calibration)
TUM_FR1_CALIB = np.array([517.3, 516.5, 318.6, 255.3,
                          0.2624, -0.9531, -0.0054, 0.0026, 1.1633])
EUROC_CALIB = np.array([458.654, 457.296, 367.215, 248.375,
                        -0.28340811, 0.07395907, 0.00019359, 1.76187114e-05])


def tum_stream(scenedir, stride=1):
    """Undistorted TUM rgb stream, cropped to multiple of 16."""
    fx, fy, cx, cy = TUM_FR1_CALIB[:4]
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    rgb_list = sorted((Path(scenedir) / "rgb").glob("*.png"))[::stride]
    K_new = K  # keep intrinsics, undistort in place
    for f in rgb_list:
        img = cv2.imread(str(f), cv2.IMREAD_COLOR)
        img = cv2.undistort(img, K, TUM_FR1_CALIB[4:])
        h, w, _ = img.shape
        img = img[:h - h % 16, :w - w % 16]
        t = float(f.stem)
        yield t, img, np.array([fx, fy, cx, cy])


def euroc_stream(scenedir, stride=1):
    fx, fy, cx, cy = EUROC_CALIB[:4]
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    files = sorted((Path(scenedir) / "mav0" / "cam0" / "data").glob(
        "*.png"))[::stride]
    for f in files:
        img = cv2.imread(str(f), cv2.IMREAD_COLOR)
        img = cv2.undistort(img, K, EUROC_CALIB[4:])
        h, w, _ = img.shape
        img = img[:h - h % 16, :w - w % 16]
        t = float(f.stem) / 1e9
        yield t, img, np.array([fx, fy, cx, cy])


def run_scene(cfg, network, frames):
    from ..slam import DPVO

    slam = None
    tmap = []
    for t, img, intr in frames:
        if slam is None:
            ht, wd, _ = img.shape
            slam = DPVO(cfg, network, ht, wd)
        tmap.append(t)
        slam(len(tmap) - 1, img, intrinsics=intr)
    slam.refine(12)
    poses, counters = slam.terminate()
    tstamps = np.asarray(tmap)[counters.astype(int)]
    return poses, tstamps


def evaluate(dataset, datapath, network, config, trials=1, stride=2,
             scenes=None):
    cfg = load_config(config)
    if dataset == "tum":
        scenes = scenes or TUM_FR1_SCENES
        stream_fn, gt_fn, gt_file = tum_stream, \
            metrics.load_tum_groundtruth, "groundtruth.txt"
    else:
        scenes = scenes or EUROC_SCENES
        stream_fn, gt_fn = euroc_stream, metrics.load_euroc_groundtruth
        gt_file = "mav0/state_groundtruth_estimate0/data.csv"

    results = {}

    # partial-results handler: a long multi-scene run interrupted mid-way
    # still reports what it measured (the reference registers signal +
    # atexit dumps, `evaluation/dpvo_eva_euroc.py:83-109`)
    import atexit

    def _dump_partial():
        if results:
            print("\n=== partial results (interrupted) ===")
            for scene, err in results.items():
                print(f"{scene:45s} {err:.4f}")
    atexit.register(_dump_partial)

    for scene in scenes:
        scenedir = Path(datapath) / scene
        if not scenedir.exists():
            print(f"skipping missing scene {scene}")
            continue
        gt_poses, gt_t = gt_fn(scenedir / gt_file)
        errs = []
        for trial in range(trials):
            poses, tstamps = run_scene(cfg, network,
                                       stream_fn(scenedir, stride))
            err, n = metrics.ate_rmse(poses, tstamps, gt_poses, gt_t)
            errs.append(err)
            print(f"{scene} trial {trial}: ATE {err:.4f} ({n} assoc)")
        results[scene] = float(np.median(errs))

    atexit.unregister(_dump_partial)
    print("\n=== results (ATE RMSE, median of trials) ===")
    for scene, err in results.items():
        print(f"{scene:45s} {err:.4f}")
    if results:
        print(f"{'MEAN':45s} {np.mean(list(results.values())):.4f}")
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", choices=["tum", "euroc"])
    ap.add_argument("--datapath", required=True)
    ap.add_argument("--network", default="checkpoints/dpvo.pth")
    ap.add_argument("--config", default="configs/tum.yaml")
    ap.add_argument("--trials", type=int, default=1)
    ap.add_argument("--stride", type=int, default=2)
    ap.add_argument("--scenes", nargs="*", default=None)
    args = ap.parse_args(argv)
    import os

    from ..utils.resources import resource_path

    network = resource_path(args.network)
    network = network if os.path.exists(network) else None
    evaluate(args.dataset, args.datapath, network,
             resource_path(args.config), args.trials, args.stride,
             args.scenes)


if __name__ == "__main__":
    main()
