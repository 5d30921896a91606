"""BoW retrieval self-test — counterpart of the reference's
`test_scripts/BoW_test.py` (DPRetrieval/DBoW2 over an image sequence with
an NMS window and revisit detection).

Drives the rebuild's native BinaryRetrieval backend (`native/graphlib.cpp`
via ctypes, pure-Python fallback): insert each frame's 256-bit LSH codes,
query past frames outside the NMS window, and report how often the best
match lands within RAD of the true revisit on an out-and-back sequence.

Run: python -u scripts/bow_test.py [--frames 80] [--imagedir DIR]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NMS = 20     # matches the reference's keyframe-distance exclusion role
RAD = 6      # best match within this of the true revisit counts as a hit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--imagedir", default=None)
    ap.add_argument("--size", type=int, nargs=2, default=(96, 128))
    args = ap.parse_args()

    import cv2

    from wild_video_3d_reconstruction_tpu.native import BinaryRetrieval

    ht, wd = args.size
    if args.imagedir:
        import cv2
        files = sorted(os.listdir(args.imagedir))[:args.frames]
        frames = [cv2.imread(os.path.join(args.imagedir, f))
                  for f in files]
        frames = [f for f in frames if f is not None]
        T = len(frames)
        truth = None
    else:
        # out-and-back pan: frame t and frame T-t see the same crop
        T = args.frames
        rng = np.random.default_rng(0)
        big = rng.integers(0, 255, (ht + 8, wd + 10 * (T // 2) + 8, 3),
                           np.uint8)
        frames = []
        for t in range(T):
            k = t if t < T // 2 else T - t
            frames.append(np.ascontiguousarray(
                big[:ht, 10 * k:10 * k + wd]))
        truth = lambda t: T - t

    try:
        retr = BinaryRetrieval(rad=NMS)
    except RuntimeError as e:
        print(f"native backend unavailable ({e}); nothing to test")
        return
    orb = cv2.ORB_create(nfeatures=96)
    t0 = time.time()
    hits, total = 0, 0
    for t, img in enumerate(frames):
        gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        _, desc = orb.detectAndCompute(gray, None)
        if desc is None or len(desc) < 8:
            desc = np.zeros((8, 32), np.uint8)
        retr.insert_image(t, desc.astype(np.float32))
        if t <= NMS:
            continue
        best, score, _ = retr.query(t)
        if best is None:
            continue
        if truth and t > T // 2 + RAD:
            total += 1
            hits += int(abs(best - truth(t)) <= RAD)
    dt = time.time() - t0
    print(f"{T} frames in {dt:.2f} s ({1000 * dt / T:.2f} ms/frame)")
    if truth:
        print(f"revisit hit rate (|best - true| <= {RAD}): "
              f"{hits}/{total} = {hits / max(total, 1):.1%}")


if __name__ == "__main__":
    main()
