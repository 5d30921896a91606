"""Sharded multi-chip training step (pjit / GSPMD).

One optimization step of the BA-in-the-loop VONet training objective,
sharded over the (dp, fsdp, tp) mesh from `parallel.mesh`: the clip batch is
split on dp, parameters/optimizer state on fsdp+tp, and XLA inserts the
all-gather / reduce-scatter / psum collectives. This is the multi-chip path
validated by `__graft_entry__.dryrun_multichip` on a virtual device mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..train.forward import TrainConfig, vonet_training_forward
from ..train.loss import total_loss
from . import mesh as mesh_lib


def make_optimizer(lr=8e-5, wd=1e-5, clip=10.0, steps=None, warmup_frac=0.05):
    """AdamW with global-norm clipping.

    With `steps` given, `lr` becomes the peak of a linear-warmup +
    cosine-decay schedule (warmup over `warmup_frac` of the run, decay to
    lr/20) — the shape of the reference training recipe's one-cycle
    schedule. Without it, constant lr.
    """
    if steps is not None:
        warmup = max(int(steps * warmup_frac), 1)
        lr = optax.warmup_cosine_decay_schedule(
            init_value=lr / 20, peak_value=lr, warmup_steps=warmup,
            decay_steps=steps, end_value=lr / 20)
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(lr, weight_decay=wd),
    )


def clip_loss_fn(params, batch, key, tc: TrainConfig):
    """Loss over a batch of clips (vmapped; dp shards the leading axis)."""

    def one(images, poses_gt, disps, intr, k):
        traj = vonet_training_forward(params, images, poses_gt, disps,
                                      intr, k, tc)
        loss, metrics = total_loss(traj)
        return loss, metrics

    B = batch["images"].shape[0]
    keys = jax.random.split(key, B)
    losses, metrics = jax.vmap(one)(batch["images"], batch["poses"],
                                    batch["disps"], batch["intrinsics"], keys)
    return jnp.mean(losses), jax.tree.map(jnp.mean, metrics)


def build_train_step(mesh, params, tc: TrainConfig, optimizer=None):
    """Returns (train_step, sharded_params, opt_state).

    train_step(params, opt_state, batch, key) -> (params, opt_state, metrics)
    """
    optimizer = optimizer or make_optimizer()
    p_shard = mesh_lib.param_sharding(mesh, params)
    params = jax.device_put(params, p_shard)
    # the optimizer state embeds param-shaped moment trees (adam mu/nu);
    # the shape-based sharding rule assigns them the same fsdp/tp layout as
    # their parameters and replicates the scalars (step count, etc.)
    o_shard = mesh_lib.param_sharding(
        mesh, jax.eval_shape(optimizer.init, params))
    opt_state = jax.jit(optimizer.init, out_shardings=o_shard)(params)

    b_shard = mesh_lib.batch_sharding(mesh)
    r_shard = mesh_lib.replicated(mesh)

    @functools.partial(
        jax.jit,
        in_shardings=(p_shard, o_shard, b_shard, r_shard),
        out_shardings=(p_shard, o_shard, r_shard),
        donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, key):
        (loss, metrics), grads = jax.value_and_grad(
            clip_loss_fn, has_aux=True)(params, batch, key, tc)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step, params, opt_state


def make_synthetic_batch(key, batch_size, tc: TrainConfig, ht=48, wd=64):
    """Random clip batch with consistent shapes (testing / dry runs)."""
    ks = jax.random.split(key, 4)
    images = jax.random.randint(ks[0], (batch_size, tc.frames, ht, wd, 3),
                                0, 255, dtype=jnp.int32).astype(jnp.uint8)
    xi = 0.01 * jax.random.normal(ks[1], (batch_size, tc.frames, 6))
    from ..ops import lie
    poses = lie.se3_exp(xi)
    disps = jax.random.uniform(ks[2], (batch_size, tc.frames,
                                       ht // 4, wd // 4),
                               minval=0.3, maxval=1.5)
    intr = jnp.tile(jnp.asarray([40.0, 40.0, wd / 2, ht / 2])[None],
                    (batch_size, 1))
    return {"images": images, "poses": poses, "disps": disps,
            "intrinsics": intr}
