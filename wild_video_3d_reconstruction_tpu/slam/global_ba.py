"""Global bundle adjustment over all keyframes (terminate-time).

Port of `DPVO.global_bundle_adjustment` + distance-based edge proposal
(`dpvo/dpvo.py:383-505`): pairwise keyframe distances from bidirectional
mean flow magnitude, sequential + distance/long-range edges, one update-
network pass over the global edge set and a full-window Gauss-Newton solve.

Requires cfg.ENABLE_GLOBAL_BA (which sizes the feature ring to the full
buffer, `dpvo/dpvo.py:58-60`). Shapes are bucketed: the jitted global pass
compiles once per (frame-bucket, edge-bucket) pair.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ba.gauss_newton import BAConfig, bundle_adjust
from ..models.update import update_forward
from ..models.vonet import DIM, P
from ..ops import projective as pops
from ..ops.segment import neighbors
from .steps import _feat_dtype


def _pair_distance_matrix(cfg, state, n_cap, chunk=64):
    """Bidirectional mean flow magnitude between all keyframe pairs.

    Returns [n_cap, n_cap] float32 (inf outside the live range). Mirrors
    `compute_keyframe_distance` (`dpvo/dpvo.py:383-407`, beta=0.5) but
    vectorized: one flow_mag evaluation per (i -> j) with frame-i patches.
    """
    M = cfg.PATCHES_PER_FRAME
    n = state.n_frames

    def row(i):
        kk = i * M + jnp.arange(M)
        ii = jnp.full((M,), 0, jnp.int32) + i

        def one_target(j):
            jjv = jnp.full((M,), 0, jnp.int32) + j
            fm = pops.flow_mag(state.poses, state.patches, state.intrinsics,
                               ii, jjv, kk, beta=0.5)
            return fm.mean()

        return jax.vmap(one_target)(jnp.arange(n_cap))

    D = jax.lax.map(row, jnp.arange(n_cap))        # [n_cap, n_cap] i->j
    D = 0.5 * (D + D.T)
    live = (jnp.arange(n_cap) < n)
    D = jnp.where(live[:, None] & live[None, :], D, jnp.inf)
    return D


def propose_edges(cfg, slam, max_edges=512):
    """Host-side edge proposal (`dpvo/dpvo.py:409-474`)."""
    n = slam.n
    n_cap = 1 << max(int(np.ceil(np.log2(max(n, 2)))), 4)
    dist_fn = jax.jit(functools.partial(_pair_distance_matrix, cfg),
                      static_argnums=(1,))
    D = np.asarray(dist_fn(slam.state, n_cap))[:n, :n]

    ii, jj = [], []
    for i in range(n - 1):
        ii.append(i)
        jj.append(i + 1)
    if cfg.USE_DISTANCE_EDGES:
        cand = [(D[i, j], i, j) for i in range(n) for j in range(i + 2, n)
                if np.isfinite(D[i, j]) and D[i, j] < cfg.DISTANCE_THRESH]
        cand.sort()
        for _, i, j in cand[:max_edges]:
            ii.append(i)
            jj.append(j)
    else:
        for i in range(0, n, 5):
            for j in range(i + 10, min(i + 20, n)):
                ii.append(i)
                jj.append(j)
    return np.asarray(ii), np.asarray(jj)


def run_global_ba(cfg, slam, iterations=2, max_edges=512):
    """One network update + global Gauss-Newton over the proposed edges."""
    if not cfg.ENABLE_GLOBAL_BA or slam.n < 2:
        return
    n = slam.n
    M = cfg.PATCHES_PER_FRAME
    ii_f, jj_f = propose_edges(cfg, slam, max_edges)
    if len(ii_f) == 0:
        return
    print(f"Global BA over {n} keyframes, {len(ii_f)} frame edges")

    # expand to patch edges
    ii = np.repeat(ii_f, M)
    jj = np.repeat(jj_f, M)
    kk = (ii_f[:, None] * M + np.arange(M)[None, :]).reshape(-1)

    E = len(ii)
    E_pad = ((E + 8191) // 8192) * 8192
    pad = E_pad - E
    ii = np.pad(ii, (0, pad))
    jj = np.pad(jj, (0, pad))
    kk = np.pad(kk, (0, pad))
    valid = np.zeros(E_pad, bool)
    valid[:E] = True
    n_bucket = 1 << max(int(np.ceil(np.log2(max(n + 1, 2)))), 4)

    per_patch_cap = int(np.bincount(ii_f).max()) + 1
    state = slam.state
    out = _global_pass(cfg, slam.params, state, jnp.asarray(ii),
                       jnp.asarray(jj), jnp.asarray(kk), jnp.asarray(valid),
                       n_bucket, iterations, per_patch_cap)
    slam.state = state._replace(poses=out[0], patches=out[1])


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_bucket", "iterations",
                                    "per_patch_cap"))
def _global_pass(cfg, params, state, ii, jj, kk, valid, n_bucket,
                 iterations, per_patch_cap=None):
    M = cfg.PATCHES_PER_FRAME
    pmem = cfg.pmem
    fd = _feat_dtype(cfg)
    E = ii.shape[0]
    n = state.n_frames

    coords = pops.transform(state.poses, state.patches, state.intrinsics,
                            ii, jj, kk)
    coords = jnp.where(valid[:, None, None, None], coords, 0.0)

    from ..ops.corr import patch_corr_pyramid
    corr = patch_corr_pyramid(
        state.gmap, (state.fmap1, state.fmap2), coords.astype(jnp.float32),
        jnp.mod(kk, M * pmem), jnp.mod(jj, pmem), radius=3,
        valid=valid.astype(jnp.float32), chunk=cfg.CORR_CHUNK)

    ctx = state.imap[jnp.mod(kk, M * pmem)]
    kk_seg = jnp.where(valid, kk, n_bucket * M)
    ij_seg = jnp.where(valid, ii * n_bucket + jj, n_bucket * n_bucket)
    nbr_ix, nbr_jx = neighbors(kk, jj, valid=valid)
    net = jnp.zeros((E, DIM), fd)

    _, delta, weight = update_forward(
        params["update"], net, ctx.astype(fd), corr.astype(fd),
        kk_seg, ij_seg, nbr_ix, nbr_jx, valid,
        n_bucket * M + 1, n_bucket * n_bucket + 1)

    target = coords[:, P // 2, P // 2, :].astype(jnp.float32) + \
        delta.astype(jnp.float32)
    weight = weight.astype(jnp.float32) * valid[:, None]

    ba_cfg = BAConfig(window=n_bucket, patch_slots=n_bucket * M,
                      iterations=iterations, per_patch_cap=per_patch_cap)
    poses, patches = bundle_adjust(
        state.poses, state.patches, state.intrinsics[0], target, weight,
        1e-4, ii, jj, kk, valid.astype(jnp.float32), 1, n, 0, ba_cfg)
    return poses, patches
