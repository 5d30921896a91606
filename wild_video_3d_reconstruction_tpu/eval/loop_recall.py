"""Loop-closure retrieval recall on a synthetic revisiting sequence.

VERDICT r1 asked for a quantified recall of the VLAD + matcher chain
(reference: hloc NetVLAD, `dpvo/netvlad_retrieval.py:63-132`, exercised by
`test_scripts/netvlad_loop_test.py`). With zero egress there is no real
loopy dataset in the image, so this driver builds the controlled
equivalent: a camera panning across a large texture and returning along
the same path, so frame t and frame T-t observe the same crop. Recall is
the fraction of returning-half queries whose top-1 database hit lies
within +/-`tol` frames of the ground-truth revisit.

Usage: python -m wild_video_3d_reconstruction_tpu.eval.loop_recall
         [--frames 80] [--shift 24] [--thresh 0.0]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

import jax
import jax.numpy as jnp


def build_frames(T, shift, ht, wd, seed=0):
    """Out-and-back pan: frame t and T-t (t < T/2) share the same crop."""
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 255, size=(ht + 8, wd + shift * (T // 2) + 8, 3),
                       dtype=np.uint8)
    frames, gt = [], []
    for t in range(T):
        k = t if t < T // 2 else T - t
        x = shift * k
        frames.append(np.ascontiguousarray(big[:ht, x:x + wd]))
        gt.append(T - t if t >= T // 2 else None)
    return frames, gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--shift", type=int, default=24)
    ap.add_argument("--size", type=int, nargs=2, default=(192, 256))
    ap.add_argument("--thresh", type=float, default=0.0)
    ap.add_argument("--tol", type=int, default=2)
    ap.add_argument("--skip-window", type=int, default=10)
    ap.add_argument("--fit", action="store_true",
                    help="fit VLAD centers on the sequence (spherical "
                         "k-means pre-pass) instead of random centers")
    args = ap.parse_args()

    from ..loop.netvlad import (DescriptorDatabase, VLADDescriptor,
                                fit_centers_from_images)
    from ..models import vonet

    ht, wd = args.size
    frames, gt = build_frames(args.frames, args.shift, ht, wd)

    params = vonet.init_vonet(jax.random.PRNGKey(0))
    if args.fit:
        vlad = VLADDescriptor(
            centers=fit_centers_from_images(params, frames))
    else:
        vlad = VLADDescriptor()
    encode = jax.jit(lambda img: vonet.encode_frame(
        params, img, jnp.float32).fmap)

    db = DescriptorDatabase(vlad.dim)
    hits, margins, n_q = 0, [], 0
    for t, img in enumerate(frames):
        desc = vlad.extract(np.asarray(encode(jnp.asarray(img))))
        db.insert_desc(t, desc)
        if gt[t] is None:
            continue
        score, j = db.query_online(t, args.skip_window, top_k=1)
        n_q += 1
        if j is None or score < args.thresh:
            continue
        if abs(j - gt[t]) <= args.tol:
            hits += 1
            margins.append(float(score))

    recall = hits / max(n_q, 1)
    print(json.dumps({
        "metric": "loop_retrieval_recall_top1",
        "value": round(recall, 4),
        "queries": n_q,
        "hits": hits,
        "mean_hit_score": round(float(np.mean(margins)) if margins else 0.0,
                                4),
        "descriptor": ("VLAD-16x128 over fnet features ("
                       + ("k-means-fitted" if args.fit else "random")
                       + " centers, random weights)"),
    }))


if __name__ == "__main__":
    main()
