"""Gauss-Newton bundle adjustment with Schur complement (pure JAX).

TPU-native replacement for the reference's `cuda_ba` kernel stack
(`dpvo/fastba/ba_cuda.cu:214-540`): per-edge reprojection residuals with
analytic 2x6 pose and 2x1 inverse-depth Jacobians, robust outlier masking,
dense pose Hessian + pose/depth coupling assembled via segment sums, Schur
complement over the (diagonal) depth block, Cholesky solve, and manifold
retractions with the reference's depth clamping rules.

TPU design notes:
  * The CUDA kernel's atomicAdd accumulation becomes `jax.ops.segment_sum`
    into dense [W, W, 6, 6] / [W, M, 6] blocks — W (pose window) and M
    (patch slots) are *static capacities*; the live window [t0, t1) and the
    live patch range are selected with masks, so one compiled program serves
    every frame (no recompiles as the window slides).
  * A structure-only solve (t1 == t0, used by loop-closure triangulation,
    `ba_cuda.cu:494-506`) falls out naturally: with no free poses the Schur
    system is the identity and only depths update — no control flow needed.
  * Everything is fp32 (the reference keeps BA in fp32 under autocast).

Semantics preserved from the reference:
  * shared pinhole intrinsics from slot 0 (`ba_cuda.cu:232-238`),
  * robust mask: |r| < 128 px, Z > 0.2, reprojection within +-64 px of the
    2cx x 2cy image box (`ba_cuda.cu:277-278`),
  * damping: C + lambda on the depth diagonal; S += I (1e-4 S + 1)
    (`ba_cuda.cu:492,518`),
  * retraction: left-multiplied se3 exp for poses in [t0, t1); depth reset
    to 1.0 when > 20, floored at 1e-4, broadcast across the patch
    (`ba_cuda.cu:160-210`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import lie


class BAConfig(NamedTuple):
    window: int          # static pose-window capacity (>= t1 - t0)
    patch_slots: int     # static distinct-patch capacity
    iterations: int = 2
    min_depth: float = 0.2
    max_residual: float = 128.0
    bounds_margin: float = 64.0
    ep: float = 1.0      # diagonal epsilon added to the Schur system
    lm: float = 1e-4     # multiplicative diagonal damping on S
    # max live edges per patch (2 * PATCH_LIFETIME in the online graph).
    # When set, depth-block accumulation uses a gathered per-patch table
    # (O(M * cap)); when None, a dense one-hot matmul (O(E * M)) — fine for
    # small/offline problems, prohibitive at full configs.
    per_patch_cap: int | None = None
    # depth-prior regularization strength (`dpvo/ba.py:151-159` mu);
    # applied only when bundle_adjust receives patches_est
    prior_mu: float = 2.0
    # depth retraction rule: "cuda" = the inference kernel's reset/floor
    # (`ba_cuda.cu:160-210`: d > 20 -> 1.0, floor 1e-4); "train" = the
    # python training BA's clamp (`dpvo/ba.py:183`: clamp(1e-3, 10.0))
    depth_clamp: str = "cuda"
    # per-iteration trust region on the inverse-depth step (r5): |dZ| is
    # clamped to this many inverse-depth units per GN iteration. The
    # reference's absolute damping Q = 1/(C + 1e-4) (`ba_cuda.cu:492`)
    # explodes when C = sum w * Jz^2 ~ 0 while u = sum w * Jz * r stays
    # noisy, so dZ = Q * u can be thousands of inverse-depth units in one
    # step (then the >20 reset / 1e-4 floor thrash). The map is scale-
    # normalized (mean inverse depth ~ 1), so one unit is a principled
    # per-iteration bound: legit steady-state steps are far smaller.
    # NOTE this is a runaway BACKSTOP, not a bootstrap fix — r5 captured-
    # input experiments show the bootstrap collapse of the consistent
    # system persists under any clamp (the depth signal itself is wrong
    # there; see slam/steps.py update_op). None disables (exact reference
    # semantics).
    depth_step_clamp: float | None = 1.0


def _group_by_patch(q, okq, M_, cap, order=None):
    """Scatter-free per-patch edge table: [M_, cap] edge ids (E = dummy).

    One stable argsort by patch slot + vectorized searchsorted, like the
    correlation kernel's frame bucketing. `order` lets the caller inject a
    precomputed stable ordering by (not-okq, q) — `slam.steps` shares one
    argsort between this and the neighbor links."""
    E = q.shape[0]
    key = jnp.where(okq, q, M_)
    if order is None:
        order = jnp.argsort(key, stable=True)
    q_sorted = key[order]
    starts = jnp.searchsorted(q_sorted, jnp.arange(M_))
    idx = starts[:, None] + jnp.arange(cap)[None, :]
    idxc = jnp.clip(idx, 0, E - 1)
    valid = (idx < E) & (q_sorted[idxc] == jnp.arange(M_)[:, None])
    return jnp.where(valid, order[idxc], E).astype(jnp.int32)


def _edge_system(poses, patches, intr, target, ii, jj, kk, cfg: BAConfig):
    """Residuals, Jacobians, and robust mask for every edge (vectorized).

    Returns r [E,2], Ji/Jj [E,2,6], Jz [E,2], mask [E].
    """
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]

    # back-project the patch center of the source frame
    pc = patches[kk][:, :, 1, 1]                   # [E, 3] (x, y, invd)
    X0 = jnp.stack([(pc[:, 0] - cx) / fx, (pc[:, 1] - cy) / fy,
                    jnp.ones_like(pc[:, 0]), pc[:, 2]], axis=-1)

    Gij = lie.se3_mul(poses[jj], lie.se3_inv(poses[ii]))
    X1 = lie.se3_act4(Gij, X0)
    X, Y, Z, W = X1[:, 0], X1[:, 1], X1[:, 2], X1[:, 3]

    safeZ = jnp.where(jnp.abs(Z) > 1e-6, Z, 1e-6)
    x1 = fx * (X / safeZ) + cx
    y1 = fy * (Y / safeZ) + cy
    r = target - jnp.stack([x1, y1], axis=-1)

    mask = ((jnp.linalg.norm(r, axis=-1) < cfg.max_residual)
            & (Z > cfg.min_depth)
            & (x1 > -cfg.bounds_margin) & (y1 > -cfg.bounds_margin)
            & (x1 < 2 * cx + cfg.bounds_margin)
            & (y1 < 2 * cy + cfg.bounds_margin)
            & jnp.all(jnp.isfinite(r), axis=-1))

    d = jnp.where(Z >= cfg.min_depth, 1.0 / safeZ, 0.0)
    d2 = d * d
    o = jnp.zeros_like(d)

    # rows of d(pix)/d(xi_j) for left-multiplicative pose-j perturbation
    Jx = jnp.stack([fx * W * d, o, -fx * X * W * d2,
                    -fx * X * Y * d2, fx * (1 + X * X * d2), -fx * Y * d], -1)
    Jy = jnp.stack([o, fy * W * d, -fy * Y * W * d2,
                    fy * (-1 - Y * Y * d2), fy * X * Y * d2, fy * X * d], -1)
    Jj = jnp.stack([Jx, Jy], axis=1)               # [E, 2, 6]
    Ji = -lie.se3_adjT(Gij[:, None, :], Jj)        # [E, 2, 6]

    tij = Gij[:, :3]
    Jz = jnp.stack([fx * (tij[:, 0] * d - tij[:, 2] * X * d2),
                    fy * (tij[:, 1] * d - tij[:, 2] * Y * d2)], axis=-1)
    # failure containment: a non-finite edge (NaN pose/patch poisoning the
    # reprojection) must not reach the Hessian — masked weights alone don't
    # stop NaN * 0 = NaN in the accumulation products
    m2, m3 = mask[:, None], mask[:, None, None]
    r = jnp.where(m2, jnp.nan_to_num(r), 0.0)
    Ji = jnp.where(m3, jnp.nan_to_num(Ji), 0.0)
    Jj = jnp.where(m3, jnp.nan_to_num(Jj), 0.0)
    Jz = jnp.where(m2, jnp.nan_to_num(Jz), 0.0)
    return r, Ji, Jj, Jz, mask.astype(poses.dtype)


def _gn_iteration(poses, patches, intr, target, weight, lam, ii, jj, kk,
                  valid, t0, t1, m_base, cfg: BAConfig, patches_est=None,
                  patch_table=None, ar=None):
    """ar: optional all-reduce applied to every edge-summed accumulator
    (B, Em, C/u/touched, v). Identity for the single-chip path; the
    edge-sharded multi-chip path (`parallel.infer_shard`) passes a psum
    over the edges mesh axis so each shard contributes its partial
    Hessian and every device solves the identical (replicated) system —
    the TPU analogue of the reference's single-GPU atomicAdd accumulation
    (`ba_cuda.cu:294-322`) distributed over ICI."""
    if ar is None:
        ar = lambda x: x                                   # noqa: E731
    W_, M_ = cfg.window, cfg.patch_slots
    E = ii.shape[0]

    r, Ji, Jj, Jz, mask = _edge_system(poses, patches, intr, target,
                                       ii, jj, kk, cfg)
    w = weight * (mask * valid)[:, None]           # [E, 2]

    li = ii - t0                                   # local pose index
    lj = jj - t0
    oki = (li >= 0) & (li < (t1 - t0)) & (li < W_)
    okj = (lj >= 0) & (lj < (t1 - t0)) & (lj < W_)
    q = kk - m_base                                # local patch slot
    okq = (q >= 0) & (q < M_)

    wJi = w[:, :, None] * Ji                       # [E, 2, 6]
    wJj = w[:, :, None] * Jj
    wJz = w * Jz                                   # [E, 2]

    # One-hot matmul accumulation: TPU scatter lowering is ~10x slower than
    # MXU matmuls at these sizes, so the CUDA kernel's atomicAdd pattern
    # (`ba_cuda.cu:294-322`) becomes dense contractions against 0/1
    # selection matrices (exact — the one-hots are exact in fp32).
    iw = jnp.arange(W_)
    oh_i = ((li[:, None] == iw) & oki[:, None]).astype(jnp.float32)  # [E, W]
    oh_j = ((lj[:, None] == iw) & okj[:, None]).astype(jnp.float32)

    def pair_sum(A, pid, ok):
        # [W*W, 36] = sum_e onehot(pid)[e] * A[e]. The one-hot comes from a
        # comparison generated IN PLACE as the matmul's LHS (XLA fuses the
        # iota-compare into the operand load) — an einsum("ew,ev->ewv")
        # formulation materializes an [E, W^2] fp32 intermediate instead
        # (226 MB at default-config edge capacity, read+written 4x per GN
        # iteration; measured as a leading BA cost).
        pair = ((pid[:, None] == jnp.arange(W_ * W_)) &
                ok[:, None]).astype(jnp.float32)
        return jnp.dot(pair.T, A.reshape(E, 36),
                       preferred_element_type=jnp.float32)

    Bii = jnp.einsum("eri,erj->eij", wJi, Ji)
    Bij = jnp.einsum("eri,erj->eij", wJi, Jj)
    Bjj = jnp.einsum("eri,erj->eij", wJj, Jj)
    Pii = pair_sum(Bii, li * W_ + li, oki)
    Pij = pair_sum(Bij, li * W_ + lj, oki & okj)
    Pjj = pair_sum(Bjj, lj * W_ + lj, okj)
    # Bji[e] = w Jj^T Ji = Bij[e]^T, accumulated at the transposed pair
    # (lj, li) — recover it from Pij by swapping both the pair axes and the
    # inner 6x6 block axes instead of a fourth [E]-wide product.
    Pji = jnp.transpose(Pij.reshape(W_, W_, 6, 6),
                        (1, 0, 3, 2)).reshape(W_ * W_, 36)
    B = ar(Pii + Pij + Pji + Pjj)
    B = B.reshape(W_, W_, 6, 6).transpose(0, 2, 1, 3).reshape(6 * W_, 6 * W_)

    Eik = jnp.einsum("er,eri->ei", wJz, Ji)        # [E, 6]
    Ejk = jnp.einsum("er,eri->ei", wJz, Jj)

    cu = jnp.stack([jnp.sum(wJz * Jz, -1), jnp.sum(wJz * r, -1),
                    mask * valid], -1)                         # [E, 3]
    if cfg.per_patch_cap is not None:
        # gathered per-patch accumulation: O(M * cap) instead of O(E * M).
        # The table is edge-topology-only (loop-invariant across GN
        # iterations); callers that run several iterations pass it in
        # precomputed so the E-length argsort happens once per solve.
        table = patch_table if patch_table is not None else \
            _group_by_patch(q, okq, M_, cfg.per_patch_cap)      # [M, cap]
        # gather the COMPACT per-edge values (15 floats) and spread the
        # Eik/Ejk blocks onto their window columns after the gather with a
        # tiny [M, cap, W] one-hot contraction — gathering a pre-spread
        # [E, 3 + W*6] row (66 structural zeros of 78) costs ~4x the HBM
        # traffic at default-config sizes
        vals = jnp.concatenate([cu, Eik, Ejk], axis=-1)        # [E, 15]
        vals = jnp.concatenate(
            [vals, jnp.zeros((1, vals.shape[1]), vals.dtype)], axis=0)
        li_m = jnp.concatenate([jnp.where(oki, li, -1),
                                jnp.full((1,), -1, li.dtype)])
        lj_m = jnp.concatenate([jnp.where(okj, lj, -1),
                                jnp.full((1,), -1, lj.dtype)])
        g = vals[table]                                        # [M, cap, 15]
        accu = ar(jnp.sum(g[..., :3], axis=1))                 # [M, 3]
        C, u, touched_cnt = accu[:, 0], accu[:, 1], accu[:, 2]
        ohi_t = (li_m[table][..., None] == iw).astype(jnp.float32)
        ohj_t = (lj_m[table][..., None] == iw).astype(jnp.float32)
        Em_m = (jnp.einsum("mcw,mcd->mwd", ohi_t, g[..., 3:9])
                + jnp.einsum("mcw,mcd->mwd", ohj_t, g[..., 9:15]))
        Em = ar(Em_m.transpose(1, 2, 0).reshape(6 * W_, M_))
    else:
        tmp = (jnp.einsum("ew,ec->ewc", oh_i, Eik)
               + jnp.einsum("ew,ec->ewc", oh_j, Ejk)).reshape(E, W_ * 6)
        oh_q = ((q[:, None] == jnp.arange(M_)) &
                okq[:, None]).astype(jnp.float32)              # [E, M]
        Em = jnp.dot(tmp.T, oh_q,
                     preferred_element_type=jnp.float32)       # [W*6, M]
        Em = ar(Em.reshape(W_, 6, M_).reshape(6 * W_, M_))
        CU = ar(jnp.dot(oh_q.T, cu, preferred_element_type=jnp.float32))
        C, u, touched_cnt = CU[:, 0], CU[:, 1], CU[:, 2]
    vi = jnp.einsum("er,eri->ei", w * r, Ji)
    vj = jnp.einsum("er,eri->ei", w * r, Jj)
    v = (jnp.dot(oh_i.T, vi, preferred_element_type=jnp.float32)
         + jnp.dot(oh_j.T, vj, preferred_element_type=jnp.float32))
    v = ar(v.reshape(6 * W_))

    if patches_est is not None:
        # depth-prior regularization mu*L: patches with a positive prior
        # disparity are pulled toward it (`dpvo/ba.py:151-159`, mu = 2)
        mu = cfg.prior_mu
        Nk_ = patches_est.shape[0]
        slots_ = jnp.clip(m_base + jnp.arange(M_), 0, Nk_ - 1)
        d_est = patches_est[slots_, 2, 0, 0]
        d_cur = patches[slots_, 2, 0, 0]
        L = (d_est > 0).astype(jnp.float32)
        C = C + mu * L
        u = u - mu * L * (d_cur - d_est)

    Q = 1.0 / (C + lam)                                        # [M]

    EQ = Em * Q[None, :]
    S = B - EQ @ Em.T
    y = v - EQ @ u
    diag = jnp.diag_indices(6 * W_)
    S = S.at[diag].add(cfg.lm * S[diag] + cfg.ep)

    # r5 measured: the [72,72] cho_factor+cho_solve chain costs ~0.11 ms
    # IN-PROGRAM on v5e (an 8-deep dependent chain runs in 0.85 ms — the
    # earlier "1.5 ms Cholesky latency" readings were the ~0.87 ms
    # per-dispatch relay floor, not the solve). A single-kernel Pallas
    # Cholesky (`ops.pallas_chol.chol_solve_small`, kept + tested) times
    # EQUAL (0.12 ms/solve in-chain) — there is nothing to win here; the
    # scipy path stays.
    L = jax.scipy.linalg.cho_factor(S, lower=True)
    dX = jax.scipy.linalg.cho_solve(L, y)                      # [6W]
    # Cholesky failure containment: a singular/indefinite S yields NaNs in
    # dX; mirror the reference's zero-returning CholeskySolver + try/except
    # "BA failed" (`dpvo/ba.py:14-26`, `dpvo/dpvo.py:678-682`) by zeroing
    # the step — retraction by exp(0) keeps the previous poses/depths.
    ok = jnp.all(jnp.isfinite(dX))
    dX = jnp.where(ok, dX, 0.0)
    dZ = Q * (u - Em.T @ dX)                                   # [M]
    dZ = jnp.where(ok & jnp.isfinite(dZ), dZ, 0.0)
    if cfg.depth_step_clamp is not None:
        dZ = jnp.clip(dZ, -cfg.depth_step_clamp, cfg.depth_step_clamp)

    # ---- pose retraction over [t0, t1) -----------------------------------
    # dead window slots are routed to a sentinel row (duplicate clipped
    # indices would otherwise clobber live scatter updates)
    N = poses.shape[0]
    dX = dX.reshape(W_, 6)
    slot = jnp.arange(W_)
    live = (slot < (t1 - t0)) & (t0 + slot < N)
    gidx = jnp.where(live, jnp.clip(t0 + slot, 0, N - 1), N)
    src = poses[jnp.clip(gidx, 0, N - 1)]
    upd = lie.se3_retr(src, dX)
    poses = jnp.concatenate([poses, jnp.zeros((1, 7), poses.dtype)])
    poses = poses.at[gidx].set(jnp.where(live[:, None], upd, src))[:N]

    # ---- depth retraction (only patches with observations) ---------------
    Nk = patches.shape[0]
    touched = touched_cnt > 0
    slots = jnp.arange(M_)
    plive = touched & (m_base + slots < Nk) & (m_base + slots >= 0)
    pidx = jnp.where(plive, jnp.clip(m_base + slots, 0, Nk - 1), Nk)
    d_old = patches[jnp.clip(pidx, 0, Nk - 1)][:, 2, 0, 0]
    d_new = d_old + dZ
    if cfg.depth_clamp == "train":
        d_new = jnp.clip(d_new, 1e-3, 10.0)
    else:
        d_new = jnp.where(d_new > 20.0, 1.0, d_new)
        d_new = jnp.maximum(d_new, 1e-4)
    d_new = jnp.where(plive, d_new, d_old)
    P = patches.shape[-1]
    patches = jnp.concatenate(
        [patches, jnp.zeros((1,) + patches.shape[1:], patches.dtype)])
    patches = patches.at[pidx, 2].set(
        jnp.broadcast_to(d_new[:, None, None], (M_, P, P)))[:Nk]
    return poses, patches


@functools.partial(jax.jit, static_argnames=("cfg",))
def bundle_adjust(poses, patches, intrinsics, target, weight, lam,
                  ii, jj, kk, valid, t0, t1, m_base, cfg: BAConfig,
                  patches_est=None):
    return _bundle_adjust_impl(poses, patches, intrinsics, target, weight,
                               lam, ii, jj, kk, valid, t0, t1, m_base, cfg,
                               patches_est)


def _bundle_adjust_impl(poses, patches, intrinsics, target, weight, lam,
                        ii, jj, kk, valid, t0, t1, m_base, cfg: BAConfig,
                        patches_est=None, ar=None, patch_table=None):
    """Run cfg.iterations Gauss-Newton steps (the `fastba.BA` entry point).

    poses:      [N, 7] fp32 (w2c);     patches: [Nk, 3, P, P]
    intrinsics: [4] shared (fx, fy, cx, cy) at feature resolution
    target:     [E, 2] flow targets;   weight: [E, 2] confidences
    ii, jj, kk: [E] edges;             valid:  [E] live-edge mask
    t0, t1:     dynamic free-pose window;  m_base: first live patch id
    """
    poses = poses.astype(jnp.float32)
    patches = patches.astype(jnp.float32)
    valid = valid.astype(jnp.float32)
    if patches_est is not None:
        patches_est = patches_est.astype(jnp.float32)

    if patch_table is None and cfg.per_patch_cap is not None:
        q = kk - m_base
        okq = (q >= 0) & (q < cfg.patch_slots)
        patch_table = _group_by_patch(q, okq, cfg.patch_slots,
                                      cfg.per_patch_cap)

    def body(_, state):
        p, z = state
        return _gn_iteration(p, z, intrinsics, target, weight, lam,
                             ii, jj, kk, valid, t0, t1, m_base, cfg,
                             patches_est=patches_est,
                             patch_table=patch_table, ar=ar)

    poses, patches = jax.lax.fori_loop(0, cfg.iterations, body,
                                       (poses, patches))
    return poses, patches
