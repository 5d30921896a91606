"""Keypoint-detector speed test — counterpart of the reference's
`test_scripts/sp_det_speed.py` (SuperPoint extraction timing over an
image directory).

The rebuild's SuperPoint-equivalent is the weight-free Shi-Tomasi
response map + top-M selection inside the jitted insert path
(`models/vonet.keypoint_response_map` / `select_patches`,
cfg.PATCH_SELECTOR="keypoints"); this times it standalone per frame on
the default backend, from a directory or synthetic frames.

Run: python -u scripts/kp_speed.py [--imagedir DIR] [--n 100] [--m 96]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--imagedir", default=None)
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--m", type=int, default=96)
    ap.add_argument("--size", type=int, nargs=2, default=(384, 512))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from wild_video_3d_reconstruction_tpu.models import vonet

    if args.imagedir:
        import cv2
        files = sorted(os.listdir(args.imagedir))[:args.n]
        frames = [cv2.imread(os.path.join(args.imagedir, f))
                  for f in files]
        frames = [f for f in frames if f is not None]
    else:
        ht, wd = args.size
        rng = np.random.default_rng(0)
        big = rng.integers(0, 255, (ht + 64, wd + 64, 3), np.uint8)
        frames = [np.ascontiguousarray(big[(3 * t) % 64:(3 * t) % 64 + ht,
                                           (5 * t) % 64:(5 * t) % 64 + wd])
                  for t in range(args.n)]

    M = args.m

    @jax.jit
    def detect(img, key):
        kp = vonet.keypoint_response_map(img)
        h4 = (img.shape[0] - 1) // 4
        w4 = (img.shape[1] - 1) // 4
        return vonet.select_patches(key, M, h4, w4, keypoint_map=kp)

    key = jax.random.PRNGKey(0)
    out = detect(jnp.asarray(frames[0]), key)
    _ = np.asarray(out)                       # compile + device sync
    t0 = time.time()
    for i, f in enumerate(frames):
        out = detect(jnp.asarray(f), jax.random.fold_in(key, i))
    _ = np.asarray(out)
    dt = time.time() - t0
    print(f"{len(frames)} frames, {M} keypoints each: {dt:.3f} s "
          f"({1000 * dt / len(frames):.2f} ms/frame, "
          f"{len(frames) / dt:.1f} fps)")


if __name__ == "__main__":
    main()
