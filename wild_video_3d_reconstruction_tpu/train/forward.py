"""Differentiable training forward graph (BA-in-the-loop supervision).

TPU-native counterpart of the reference training entry `VONet.forward`
(`dpvo/net.py:206-291`): patchify a clip with ground-truth disparities,
build the edge set over a fixed window, and unroll STEPS update+BA
iterations, collecting (valid, coords, coords_gt, poses) supervision tuples.

Differences by design (static shapes for XLA):
  * the reference grows the window frame-by-frame after step 8 with random
    10% edge dropout (`net.py:246-266`); here the window is the full clip
    and dropout is expressed as a per-step random edge mask — the same
    regularization pressure without dynamic shapes,
  * the differentiable Gauss-Newton uses the same `ba.bundle_adjust`
    program as inference (full autodiff through Cholesky), with the
    reference's wide training bounds (+-64 px, `net.py:239`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ba.gauss_newton import BAConfig, bundle_adjust
from ..models import vonet
from ..models.update import update_forward
from ..models.vonet import DIM, P, RES
from ..ops import projective as pops
from ..ops.corr import patch_corr_pyramid
from ..ops.patchify import avg_pool2d, patchify
from ..ops.segment import neighbors


class TrainConfig(NamedTuple):
    frames: int = 8          # clip length (window)
    patches: int = 8         # patches per frame
    steps: int = 4           # unrolled update iterations
    edge_dropout: float = 0.1
    ba_iters: int = 2
    # Schur-system diagonal epsilon: the reference trains with ep=10
    # (`dpvo/net.py:238-241`), not the inference kernel's 1.0
    ba_ep: float = 10.0
    # include i == j edges like the reference's training graph
    # (`net.py:227`: jj ranges over ALL window frames); they carry no
    # supervision (dij > 0 mask) but do shape the update operator state
    self_edges: bool = False


def _patchify_clip(params, images, disps, key, tc: TrainConfig,
                   patch_coords=None):
    """Encode all frames + select/gather patches. images: [T, H, W, 3].

    patch_coords: optional [T, M, 2] injected centers (parity tests /
    deterministic debugging); None = random selection."""
    T = images.shape[0]
    feats = jax.vmap(lambda im: vonet.encode_frame(params, im,
                                                   jnp.float32))(images)
    h4, w4 = feats.fmap.shape[1], feats.fmap.shape[2]

    if patch_coords is None:
        keys = jax.random.split(key, T)
        coords = jax.vmap(lambda k: vonet.select_patches(k, tc.patches, h4,
                                                         w4))(keys)
    else:
        coords = jnp.asarray(patch_coords, jnp.float32)      # [T, M, 2]

    def gather_one(f, i, im, c, dsp):
        return vonet.gather_patches(vonet.FrameFeatures(f, i), im, c, dsp)

    imap_p, gmap_p, _, patches = jax.vmap(gather_one)(
        feats.fmap, feats.imap, images, coords, disps)
    return feats, imap_p, gmap_p, patches


def vonet_training_forward(params, images, poses_gt, disps, intrinsics, key,
                           tc: TrainConfig, patch_coords=None,
                           init_depths=None):
    """Returns a list of per-step supervision dicts.

    images:     [T, H, W, 3] uint8
    poses_gt:   [T, 7] w2c
    disps:      [T, H/4, W/4] ground-truth disparity at feature scale
    intrinsics: [4] at full resolution
    """
    T, M = tc.frames, tc.patches
    k_patch, k_depth, k_drop = jax.random.split(key, 3)

    feats, imap_p, gmap_p, patches = _patchify_clip(
        params, images, disps, k_patch, tc, patch_coords=patch_coords)
    fmap1 = feats.fmap                                   # [T, h4, w4, C]
    fmap2 = avg_pool2d(feats.fmap, 4)
    imap_flat = imap_p.reshape(T * M, DIM)
    gmap_flat = gmap_p.reshape(T * M, -1, P, P)
    patches = patches.reshape(T * M, 3, P, P)
    patches_gt = patches

    # random initial inverse depths (`net.py:224-225`)
    d0 = (jax.random.uniform(k_depth, (T * M,)) if init_depths is None
          else jnp.asarray(init_depths, jnp.float32))
    patches = patches.at[:, 2].set(
        jnp.broadcast_to(d0[:, None, None], (T * M, P, P)))

    # all-pairs edges within the window (reference order: kk-major)
    src = jnp.repeat(jnp.arange(T), M)
    ii = jnp.repeat(src[:, None], T, 1).reshape(-1)
    jj = jnp.tile(jnp.arange(T), T * M)
    kk = jnp.repeat(jnp.arange(T * M), T)
    keep = jnp.ones((T * M * T,), bool) if tc.self_edges else (ii != jj)
    E = T * M * T

    intr4 = intrinsics / RES
    intr_frames = jnp.tile(intr4[None], (T, 1))
    poses = jnp.zeros((T, 7)).at[:, 6].set(1.0)          # identity init
    net = jnp.zeros((E, DIM))

    ba_cfg = BAConfig(window=T, patch_slots=T * M, iterations=tc.ba_iters,
                      bounds_margin=64.0, per_patch_cap=T, ep=tc.ba_ep,
                      depth_clamp="train")

    nbr_ix, nbr_jx = neighbors(kk, jj, valid=keep)
    ij_seg = ii * T + jj
    traj = []
    for step in range(tc.steps):
        poses = jax.lax.stop_gradient(poses)
        patches = jax.lax.stop_gradient(patches)

        drop = jax.random.bernoulli(jax.random.fold_in(k_drop, step),
                                    1.0 - tc.edge_dropout, (E,))
        valid_e = keep & drop

        coords = pops.transform(poses, patches, intr_frames, ii, jj, kk)
        corr = patch_corr_pyramid(gmap_flat, (fmap1, fmap2),
                                  coords, kk, jj, radius=3,
                                  valid=valid_e, chunk=4096)
        ctx = imap_flat[kk]
        net, delta, weight = update_forward(
            params["update"], net, ctx, corr, kk, ij_seg, nbr_ix, nbr_jx,
            valid_e, T * M, T * T)

        target = coords[:, P // 2, P // 2, :] + delta
        weight = weight * valid_e[:, None]
        poses, patches = bundle_adjust(
            poses, patches, intr4, target, weight, 1e-4, ii, jj, kk,
            valid_e.astype(jnp.float32), 1, T, 0, ba_cfg)

        coords_est = pops.transform(poses, patches, intr_frames, ii, jj, kk)
        coords_gt, valid_gt, _ = pops.transform(
            poses_gt, patches_gt, intr_frames, ii, jj, kk, jacobian=True)
        dij = jnp.abs(ii - jj)
        sup = valid_e & (dij > 0) & (dij <= 2)
        traj.append({
            "coords": coords_est,
            "coords_gt": coords_gt,
            "valid": sup.astype(jnp.float32) * valid_gt,
            "poses": poses,
            "poses_gt": poses_gt,
        })
    return traj
