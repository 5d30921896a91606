"""Rendered synthetic world: geometric consistency with the framework ops.

`train/synth.py` renders slanted-plane clips with analytic ground truth;
these tests prove the rendered images, poses and disparities agree with
`ops.projective` conventions (photometric + geometric consistency), so
training on them teaches real tracking (`eval/learn_synth.py` is the
long-running demonstration; its result is recorded in docs/ROUND2.md).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from wild_video_3d_reconstruction_tpu.ops import projective as pops
from wild_video_3d_reconstruction_tpu.train.synth import (make_world_batch,
                                                          render_clip)

HT, WD = 48, 64


pytestmark = pytest.mark.slow  # integration/soak tier


def _clip(seed=0, frames=4):
    rng = np.random.default_rng(seed)
    return render_clip(rng, frames=frames, ht=HT, wd=WD)


def _patches_from_gt(rng, disps0, M=40):
    h4, w4 = disps0.shape
    px = rng.uniform(2, w4 - 3, M)
    py = rng.uniform(2, h4 - 3, M)
    patches = np.zeros((M, 3, 3, 3), np.float32)
    offs = np.arange(3) - 1
    patches[:, 0] = px[:, None, None] + offs[None, None, :]
    patches[:, 1] = py[:, None, None] + offs[None, :, None]
    d = disps0[np.clip(py.astype(int), 0, h4 - 1),
               np.clip(px.astype(int), 0, w4 - 1)]
    patches[:, 2] = d[:, None, None]
    return px, py, patches


def test_photometric_consistency():
    images, poses, disps, intr = _clip()
    rng = np.random.default_rng(1)
    px, py, patches = _patches_from_gt(rng, disps[0])
    M = len(px)
    intr4 = jnp.asarray(np.tile(intr[None] / 4.0, (len(images), 1)))
    for k in (1, 3):
        coords = np.asarray(pops.transform(
            jnp.asarray(poses), jnp.asarray(patches), intr4,
            jnp.zeros(M, jnp.int32), jnp.full((M,), k, jnp.int32),
            jnp.arange(M)))[:, 1, 1, :]
        inb = ((coords[:, 0] > 1) & (coords[:, 0] < WD // 4 - 2) &
               (coords[:, 1] > 1) & (coords[:, 1] < HT // 4 - 2))
        assert inb.mean() > 0.5
        c0 = images[0][np.clip((py * 4).astype(int), 0, HT - 1),
                       np.clip((px * 4).astype(int), 0, WD - 1)]
        ck = images[k][np.clip((coords[:, 1] * 4).astype(int), 0, HT - 1),
                       np.clip((coords[:, 0] * 4).astype(int), 0, WD - 1)]
        err = np.abs(c0.astype(float) - ck.astype(float)).mean(1)[inb]
        # interpolation blur only; unrelated pixels differ by ~60
        assert err.mean() < 12.0, err.mean()


def test_disparity_consistency():
    """GT disparity of frame k at the reprojected pixel matches the depth
    of the transformed point (the scene is one rigid surface)."""
    images, poses, disps, intr = _clip(seed=2)
    rng = np.random.default_rng(3)
    px, py, patches = _patches_from_gt(rng, disps[0])
    M = len(px)
    intr4 = jnp.asarray(np.tile(intr[None] / 4.0, (len(images), 1)))
    k = 2
    pts = np.asarray(pops.transform(
        jnp.asarray(poses), jnp.asarray(patches), intr4,
        jnp.zeros(M, jnp.int32), jnp.full((M,), k, jnp.int32),
        jnp.arange(M), depth=True))
    # proj(depth=True) returns 1/Z_hom with Z_hom = Z_real * d0 (iproj's
    # homogeneous weight), so frame-k inverse depth = d0 * that channel
    coords = pts[..., 1, 1, :2]
    inv_k = patches[:, 2, 1, 1] * pts[..., 1, 1, 2]
    h4, w4 = disps[k].shape
    inb = ((coords[:, 0] > 1) & (coords[:, 0] < w4 - 2) &
           (coords[:, 1] > 1) & (coords[:, 1] < h4 - 2) & (inv_k > 1e-3))
    dk = disps[k][np.clip(coords[inb, 1].astype(int), 0, h4 - 1),
                  np.clip(coords[inb, 0].astype(int), 0, w4 - 1)]
    rel = np.abs(inv_k[inb] - dk) / dk
    assert np.median(rel) < 0.05, np.median(rel)


def test_world_batch_trains():
    """One sharded optimizer step on rendered clips: finite decreasing-able
    loss and nonzero flow supervision."""
    import jax

    from wild_video_3d_reconstruction_tpu.models.vonet import init_vonet
    from wild_video_3d_reconstruction_tpu.parallel import (
        TrainConfig, build_train_step, make_mesh)

    tc = TrainConfig(frames=4, patches=4, steps=2)
    batch = make_world_batch(0, 2, tc, ht=32, wd=32)
    assert batch["images"].shape == (2, 4, 32, 32, 3)
    assert np.isfinite(batch["disps"]).all()
    mesh = make_mesh(1)
    params = init_vonet(jax.random.PRNGKey(0))
    step, params, opt_state = build_train_step(mesh, params, tc)
    b = {k: jnp.asarray(v) for k, v in batch.items()}
    params, opt_state, metrics = step(params, opt_state, b,
                                      jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["flow_loss"]) > 0
