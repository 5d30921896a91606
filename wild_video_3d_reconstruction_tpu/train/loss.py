"""Training losses: reprojection flow + relative pose geodesic.

The DPVO supervision (flow matching of reprojected patches + pose loss on
relative transforms; the reference repo ships the forward graph at
`dpvo/net.py:286-289` without the training script — the loss follows the
published DPVO recipe)."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import lie


def flow_loss(step_out):
    c = step_out["coords"][..., 1, 1, :]
    g = step_out["coords_gt"][..., 1, 1, :]
    v = step_out["valid"]
    d = c - g
    # double-where: masked rows are replaced before the norm so its
    # non-differentiable point at 0 cannot poison the backward pass
    d = jnp.where(v[..., None] > 0, d, 1.0)
    err = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
    return jnp.sum(v * err) / jnp.maximum(jnp.sum(v), 1.0)


def pose_loss(step_out, w_rot=10.0):
    """Geodesic error on consecutive relative poses (scale-invariant in
    translation direction)."""
    P_est = step_out["poses"]
    P_gt = step_out["poses_gt"]
    dG_est = lie.se3_mul(P_est[1:], lie.se3_inv(P_est[:-1]))
    dG_gt = lie.se3_mul(P_gt[1:], lie.se3_inv(P_gt[:-1]))
    err = lie.se3_log(lie.se3_mul(dG_est, lie.se3_inv(dG_gt)))
    t_err = jnp.linalg.norm(err[:, :3], axis=-1)
    r_err = jnp.linalg.norm(err[:, 3:], axis=-1)
    return jnp.mean(t_err + w_rot * r_err)


def total_loss(traj, gamma=0.9, w_flow=0.1, w_pose=1.0):
    n = len(traj)
    loss = 0.0
    metrics = {}
    for s, out in enumerate(traj):
        w = gamma ** (n - s - 1)
        fl = flow_loss(out)
        pl = pose_loss(out)
        loss = loss + w * (w_flow * fl + w_pose * pl)
        if s == n - 1:
            metrics = {"flow_loss": fl, "pose_loss": pl}
    metrics["loss"] = loss
    return loss, metrics
