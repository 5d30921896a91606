"""Triangulation-chain correctness isolated from VO pose quality.

Renders the out-and-back world (`train/synth.py`), takes GROUND-TRUTH
w2c poses, and runs the exact `estimate_3d_keypoints` math (Shi-Tomasi
detect -> fnet describe -> mutual-NN match -> depth-only BA -> residual
gate) on a wide triplet. With perfect poses the structure-only solve
must reach sub-pixel reprojection residuals — this pins the 4-6 px
residual floor observed in `eval/loop_ate.py` on VO pose error rather
than on the triangulation chain (mirrors the gate the reference applies
at `dpvo/loop_closure/long_term.py:129-140`).
"""

import numpy as np
import jax
import jax.numpy as jnp


def test_gt_pose_triangulation_subpixel():
    from wild_video_3d_reconstruction_tpu.ba.gauss_newton import (
        BAConfig, bundle_adjust)
    from wild_video_3d_reconstruction_tpu.loop import keypoints as kp
    from wild_video_3d_reconstruction_tpu.models import vonet
    from wild_video_3d_reconstruction_tpu.ops import projective as pops
    from wild_video_3d_reconstruction_tpu.train.synth import render_sequence

    ht, wd = 96, 128
    images, poses_gt, intr4 = render_sequence(
        0, frames=44, ht=ht, wd=wd, path="outback", n_planes=3)
    params = vonet.init_vonet(jax.random.PRNGKey(0))
    encode = jax.jit(
        lambda p, im: vonet.encode_frame(p, im, jnp.float32).fmap)

    i, s = 35, 4
    idx = [i - s, i, i + s]
    ims = [images[t] for t in idx]
    fmaps = [np.asarray(encode(params, jnp.asarray(im))) for im in ims]

    K = 512
    feats = []
    for im, fm in zip(ims, fmaps):
        xy, score = kp.detect(jnp.asarray(im), K)
        desc = kp.describe(jnp.asarray(fm), xy)
        feats.append({"xy": np.asarray(xy), "desc": desc,
                      "valid": np.asarray(score) > 0})

    _, m01, ok01 = kp.match(feats[0]["desc"], feats[1]["desc"],
                            jnp.asarray(feats[0]["valid"]),
                            jnp.asarray(feats[1]["valid"]))
    _, m21, ok21 = kp.match(feats[2]["desc"], feats[1]["desc"],
                            jnp.asarray(feats[2]["valid"]),
                            jnp.asarray(feats[1]["valid"]))
    traj = np.full((K, 3), -1, np.int64)
    traj[:, 1] = np.arange(K)
    m01, ok01, m21, ok21 = map(np.asarray, (m01, ok01, m21, ok21))
    traj[m01[ok01], 0] = np.where(ok01)[0]
    traj[m21[ok21], 2] = np.where(ok21)[0]
    traj = traj[traj.min(axis=1) >= 0]
    n_tr = len(traj)
    assert n_tr >= 8, f"too few triplet trajectories: {n_tr}"
    a, b, c = traj.T
    kps0, kps1, kps2 = (feats[0]["xy"][a], feats[1]["xy"][b],
                        feats[2]["xy"][c])

    P = 3
    patches = np.zeros((n_tr, 3, P, P), np.float32)
    patches[:, 0] = kps1[:, 0, None, None]
    patches[:, 1] = kps1[:, 1, None, None]
    patches[:, 2] = 1.0 / 2.5

    kk = np.tile(np.arange(n_tr), 2)
    ii = np.ones(2 * n_tr, np.int32)
    jj = np.zeros(2 * n_tr, np.int32)
    jj[n_tr:] = 2
    target = np.concatenate([kps0, kps2], axis=0).astype(np.float32)
    weight = np.ones_like(target)

    poses = poses_gt[idx]                      # ground-truth w2c
    intr = np.asarray(intr4, np.float32)       # already full-res

    cfg_ba = BAConfig(window=4, patch_slots=n_tr, iterations=12,
                      per_patch_cap=2)
    _, patches_out = bundle_adjust(
        jnp.asarray(poses), jnp.asarray(patches), jnp.asarray(intr),
        jnp.asarray(target), jnp.asarray(weight), 1e-3,
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk),
        jnp.ones(2 * n_tr, bool), 3, 3, 0, cfg_ba)

    intr_frames = jnp.tile(jnp.asarray(intr)[None], (3, 1))
    coords = pops.transform(jnp.asarray(poses), patches_out, intr_frames,
                            jnp.asarray(ii), jnp.asarray(jj),
                            jnp.asarray(kk))
    resid = np.linalg.norm(np.asarray(coords[:, 1, 1, :]) - target, axis=-1)
    max_resid = np.maximum(resid[:n_tr], resid[n_tr:])

    # with GT poses the depth-only solve must reach sub-pixel medians and
    # pass the reference's <2px gate for (nearly) every trajectory
    assert np.median(max_resid) < 1.0, np.percentile(max_resid, [25, 50, 75])
    assert (max_resid < 2.0).mean() > 0.9, (max_resid < 2.0).mean()
