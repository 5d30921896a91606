"""End-to-end learning demonstration on rendered synthetic clips.

The build image has no TartanAir and no published checkpoint, so this is
the strongest available evidence that the training stack (renderer ->
patchify -> correlation -> update operator -> differentiable BA -> loss
-> sharded optimizer) actually teaches tracking: train a VONet for a few
hundred steps on rendered slanted-plane clips (`train/synth.py`) and
compare flow end-point error and pose error against the random-init
network on HELD-OUT clips.

Run: python -u -m wild_video_3d_reconstruction_tpu.eval.learn_synth \
         [--steps 200] [--batch 4] [--eval_clips 8]
Prints one JSON line with before/after metrics.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def evaluate(params, batches, tc):
    """Final-step flow EPE (px at /4 scale) + pose rotation/translation
    errors of the training forward on held-out clips."""
    import jax
    import jax.numpy as jnp

    from ..ops import lie
    from ..train.forward import vonet_training_forward

    @jax.jit
    def run_one(params, images, poses_gt, disps, intr, key):
        traj = vonet_training_forward(params, images, poses_gt, disps,
                                      intr, key, tc)
        out = traj[-1]
        v = out["valid"]
        epe = jnp.sum(jnp.linalg.norm(
            (out["coords"] - out["coords_gt"])[:, 1, 1, :], axis=-1) * v) \
            / jnp.maximum(v.sum(), 1.0)
        # align both trajectories to their first pose, compare relatives
        def rel(poses):
            return jax.vmap(lambda p: lie.se3_mul(p, lie.se3_inv(poses[0]))
                            )(poses)
        dP = lie.se3_mul(rel(out["poses"]),
                         lie.se3_inv(rel(out["poses_gt"])))
        t_err = jnp.linalg.norm(dP[:, :3], axis=-1).mean()
        w = jnp.clip(jnp.abs(dP[:, 6]), 0.0, 1.0)
        r_err = (2 * jnp.arccos(w)).mean()
        return epe, t_err, r_err

    epes, terrs, rerrs = [], [], []
    for b in batches:
        B = b["images"].shape[0]
        for i in range(B):
            e, t, r = run_one(params, b["images"][i], b["poses"][i],
                              b["disps"][i], b["intrinsics"][i],
                              jax.random.PRNGKey(1234 + i))
            epes.append(float(e))
            terrs.append(float(t))
            rerrs.append(float(r))
    return {"epe": float(np.mean(epes)),
            "t_err": float(np.mean(terrs)),
            "r_err": float(np.mean(rerrs))}


def main(steps=200, batch=4, eval_clips=8, lr=3e-4, seed=0, frames=6,
         patches=8, ht=48, wd=64, log_every=20, save=None, resume=None,
         harden=False):
    import jax

    from ..models.vonet import init_vonet
    from ..parallel import (TrainConfig, build_train_step, make_mesh)
    from ..parallel.train_step import make_optimizer
    from ..train.synth import make_world_batch

    tc = TrainConfig(frames=frames, patches=patches, steps=3)
    mesh = make_mesh(1)
    params0 = init_vonet(jax.random.PRNGKey(seed))
    if resume:
        from ..train.trainer import load_checkpoint
        params0 = load_checkpoint(resume, params0)
        print("resumed params from", resume, flush=True)

    held_out = [make_world_batch(10_000 + i, 1, tc, ht=ht, wd=wd)
                for i in range(eval_clips)]
    print("evaluating random-init network ...", flush=True)
    before = evaluate(params0, held_out, tc)
    print("random init:", before, flush=True)

    step_fn, params, opt_state = build_train_step(
        mesh, params0, tc, optimizer=make_optimizer(lr=lr, steps=steps))
    t0 = time.time()
    for s in range(steps):
        b = make_world_batch(seed * 1000 + s, batch, tc, ht=ht, wd=wd,
                             harden=(s % 2 == 0) if harden == "mix"
                             else harden)
        batch_dev = {k: jax.numpy.asarray(v) for k, v in b.items()}
        params, opt_state, metrics = step_fn(params, opt_state, batch_dev,
                                             jax.random.PRNGKey(s))
        if s % log_every == 0 or s == steps - 1:
            print(f"step {s}: loss={float(metrics['loss']):.4f} "
                  f"flow={float(metrics['flow_loss']):.4f} "
                  f"pose={float(metrics['pose_loss']):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        if save and s and s % 100 == 0:
            from ..train.trainer import save_checkpoint
            save_checkpoint(jax.device_get(params), save, s)

    if save:
        from ..train.trainer import save_checkpoint
        save_checkpoint(jax.device_get(params), save, steps)
        print("saved trained params to", save, flush=True)

    after = evaluate(params, held_out, tc)
    print("trained:", after, flush=True)
    result = {"metric": "synth_learning", "before": before, "after": after,
              "steps": steps,
              "epe_ratio": after["epe"] / max(before["epe"], 1e-9)}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--eval_clips", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--save", type=str, default=None,
                    help="directory to save the trained params")
    ap.add_argument("--resume", type=str, default=None,
                    help="orbax checkpoint dir to continue from")
    ap.add_argument("--harden", nargs="?", const=True, default=False,
                    help="train on hardened worlds; 'mix' alternates "
                         "clean/hardened batches (moving occluders + "
                         "exposure jitter); held-out eval stays clean")
    args = ap.parse_args()
    main(steps=args.steps, batch=args.batch, eval_clips=args.eval_clips,
         lr=args.lr, save=args.save, resume=args.resume,
         harden=args.harden)
