"""Sim(3) pose-graph optimization (loop closure backend).

Replaces the reference's pypose-autograd + Eigen-sparse-Cholesky PGO
(`dpvo/loop_closure/optim_utils.py:163-255`, `fastba/ba.cpp:174-234`):
residuals r_e = Log(C_e * Exp(G_i) * Exp(G_j)^-1) over log-coordinate
Sim(3) variables, per-edge 7x7 Jacobians from one vmapped jacfwd, and a
host-side Levenberg-Marquardt loop with a scipy sparse normal-equation
solve (the pose graph is a chain + a few loop edges, so the sparse solve is
microseconds — keeping it on the host mirrors the reference's CPU solver
and avoids a TPU round-trip per LM step).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from ..ops import lie


@jax.jit
def _edge_residual(C, Gi, Gj):
    """r = Log(C * Exp(Gi) * Exp(Gj)^-1); C: [E,8] Sim3, G*: [E,7] logs."""
    T = lie.sim3_mul(C, lie.sim3_mul(lie.sim3_exp(Gi),
                                     lie.sim3_inv(lie.sim3_exp(Gj))))
    return lie.sim3_log(T)


@jax.jit
def _edge_residual_and_jac(C, Gi, Gj):
    def one(c, gi, gj):
        f = lambda a, b: lie.sim3_log(
            lie.sim3_mul(c, lie.sim3_mul(lie.sim3_exp(a),
                                         lie.sim3_inv(lie.sim3_exp(b)))))
        r = f(gi, gj)
        Ji = jax.jacfwd(f, argnums=0)(gi, gj)
        Jj = jax.jacfwd(f, argnums=1)(gi, gj)
        return r, Ji, Jj

    return jax.vmap(one)(C, Gi, Gj)


def _solve_normal_equations(Ji, Jj, iii, jjj, resid, n, ep, lm, freen=-1):
    """Sparse Gauss-Newton step: (J^T J + lm diag + ep I) d = -J^T r.

    Mirrors `cuda_ba.solve_system` (`fastba/ba.cpp:174-234`) including the
    optional free-window restriction (only the first `freen` poses move).
    """
    r = resid.shape[0]
    rows = np.repeat(np.arange(r * 7), 14)
    cols_i = (iii[:, None, None] * 7 +
              np.tile(np.arange(7), (r, 7, 1)))          # [r, 7, 7]
    cols_j = (jjj[:, None, None] * 7 +
              np.tile(np.arange(7), (r, 7, 1)))
    cols = np.concatenate([cols_i.reshape(r, 7, 7),
                           cols_j.reshape(r, 7, 7)], axis=2).reshape(-1)
    vals = np.concatenate([np.asarray(Ji), np.asarray(Jj)],
                          axis=2).reshape(-1)
    J = sp.csr_matrix((vals, (rows, cols)), shape=(7 * r, 7 * n))
    b = -(J.T @ np.asarray(resid).reshape(-1))
    A = (J.T @ J).tocsc()
    A = A + sp.diags(A.diagonal() * lm) + ep * sp.eye(7 * n)

    if freen >= 0:
        k = 7 * freen
        A_sub = A[:k, :k] + 1e-10 * sp.eye(k)
        delta = np.zeros(7 * n)
        delta[:k] = spla.spsolve(A_sub.tocsc(), b[:k])
    else:
        delta = spla.spsolve(A + 1e-10 * sp.eye(7 * n), b)
    return delta.reshape(n, 7)


def perform_updates(poses_c2w, loop_constants, loop_ii, loop_jj, iters=30,
                    ep=0.0, lmbda=1e-6, freen=-1):
    """LM over the Sim(3) pose graph.

    poses_c2w:      [n, 7] SE3 camera-to-world (the reference passes
                    `pp.SE3(poses_).Inv()`)
    loop_constants: [L, 8] measured Sim3 relative poses (j <- i, w2c frame)
    loop_ii/jj:     [L] loop edge endpoints
    Returns c2w Sim3 [n, 8] = Exp(Ginv).Inv()
    (`optim_utils.py:222-255`)."""
    poses_c2w = np.asarray(poses_c2w, np.float32)
    n = poses_c2w.shape[0]

    w2c = lie.sim3_inv(lie.se3_to_sim3(jnp.asarray(poses_c2w)))
    Ginv = np.asarray(lie.sim3_log(w2c))                  # [n, 7]

    # sequential odometry constants: C = T_j T_i^-1 for (i, j=i-1)
    kk = np.arange(1, n)
    ll = kk - 1
    Ti = np.asarray(w2c)[kk]
    Tj = np.asarray(w2c)[ll]
    dSij = np.asarray(lie.sim3_mul(jnp.asarray(Tj),
                                   lie.sim3_inv(jnp.asarray(Ti))))
    constants = np.concatenate([dSij, np.asarray(loop_constants,
                                                 np.float32)], axis=0)
    iii = np.concatenate([kk, np.asarray(loop_ii)])
    jjj = np.concatenate([ll, np.asarray(loop_jj)])

    history = []
    for itr in range(iters):
        r, Ji, Jj = _edge_residual_and_jac(
            jnp.asarray(constants), jnp.asarray(Ginv[iii]),
            jnp.asarray(Ginv[jjj]))
        r = np.asarray(r)
        history.append(float(np.square(r).mean()))
        delta = _solve_normal_equations(Ji, Jj, iii, jjj, r, n, ep, lmbda,
                                        freen)
        G_tmp = Ginv + delta
        r_new = np.asarray(_edge_residual(
            jnp.asarray(constants), jnp.asarray(G_tmp[iii]),
            jnp.asarray(G_tmp[jjj])))
        if float(np.square(r_new).mean()) < history[-1]:
            Ginv = G_tmp
            lmbda /= 2
        else:
            lmbda *= 2
        if history[-1] < 1e-5 and itr >= 4 and \
                history[-5] / max(history[-1], 1e-30) < 1.5:
            break

    return np.asarray(lie.sim3_inv(lie.sim3_exp(jnp.asarray(Ginv))))


def run_pgo(poses_w2c, loop_constants, loop_ii, loop_jj, iters=30):
    """Full PGO round incl. the reference's gauge fix: re-anchor the result
    so the first pose past the loop window is unchanged, and return the
    first `safe_i` c2w Sim3 poses (`optim_utils.py:202-220`)."""
    poses_c2w = np.asarray(lie.se3_inv(jnp.asarray(poses_w2c, jnp.float32)))
    final = perform_updates(poses_c2w, loop_constants, loop_ii, loop_jj,
                            iters=iters)
    safe_i = int(np.max(loop_ii)) + 1
    anchor = np.asarray(lie.se3_to_sim3(jnp.asarray(poses_c2w)))[safe_i]
    correction = lie.sim3_mul(jnp.asarray(anchor),
                              lie.sim3_inv(jnp.asarray(final[safe_i])))
    final = np.asarray(lie.sim3_mul(
        jnp.broadcast_to(correction, final.shape), jnp.asarray(final)))
    return final[:safe_i]


# ---------------------------------------------------------------------------
# fully on-device LM (one jit, dense normal equations)
# ---------------------------------------------------------------------------
# The host LM above costs one device round-trip per iteration (fine on a
# local chip, ~65 ms each on a relay-attached TPU). For pose graphs up to a
# few hundred keyframes the dense [7n, 7n] system is tiny for the MXU, so
# the whole LM loop can run as a single jitted lax.fori_loop — the
# "on-device PGO" half of the north-star. Beyond ~512 poses prefer the
# host sparse path.

import functools as _ft


@_ft.partial(jax.jit, static_argnames=("iters", "n"))
def _device_lm(Ginv0, constants, iii, jjj, n, iters=30, ep=0.0,
               lmbda0=1e-6):
    E = iii.shape[0]
    oh_i = jax.nn.one_hot(iii, n, dtype=jnp.float32)      # [E, n]
    oh_j = jax.nn.one_hot(jjj, n, dtype=jnp.float32)

    def normal_step(Ginv, lmbda):
        r, Ji, Jj = _edge_residual_and_jac(constants, Ginv[iii], Ginv[jjj])
        cost = jnp.mean(jnp.square(r))
        # dense J^T J via one-hot contractions (block structure [n,7,n,7])
        JtJ_ii = jnp.einsum("ea,erc,erd,eb->acbd", oh_i, Ji, Ji, oh_i)
        JtJ_ij = jnp.einsum("ea,erc,erd,eb->acbd", oh_i, Ji, Jj, oh_j)
        JtJ_jj = jnp.einsum("ea,erc,erd,eb->acbd", oh_j, Jj, Jj, oh_j)
        H = (JtJ_ii + JtJ_ij + jnp.swapaxes(
            jnp.swapaxes(JtJ_ij, 0, 2), 1, 3) + JtJ_jj
        ).reshape(7 * n, 7 * n)
        g = (jnp.einsum("ea,erc,er->ac", oh_i, Ji, r)
             + jnp.einsum("ea,erc,er->ac", oh_j, Jj, r)).reshape(7 * n)
        diag = jnp.diag_indices(7 * n)
        H = H.at[diag].add(lmbda * H[diag] + ep)
        # gauge: clamp the first pose (the sparse path does the same by
        # construction of the sequential chain + re-anchoring)
        delta = jnp.linalg.solve(
            H + jnp.eye(7 * n) * 1e-8, -g).reshape(n, 7)
        return cost, delta

    def body(_, state):
        Ginv, lmbda = state
        cost, delta = normal_step(Ginv, lmbda)
        G_try = Ginv + delta
        r_new = _edge_residual(constants, G_try[iii], G_try[jjj])
        better = jnp.mean(jnp.square(r_new)) < cost
        Ginv = jnp.where(better, G_try, Ginv)
        lmbda = jnp.where(better, lmbda * 0.5, lmbda * 2.0)
        return Ginv, lmbda

    Ginv, _ = jax.lax.fori_loop(0, iters, body, (Ginv0, lmbda0))
    return Ginv


def perform_updates_device(poses_c2w, loop_constants, loop_ii, loop_jj,
                           iters=30, ep=0.0, lmbda=1e-6):
    """On-device counterpart of `perform_updates` (same inputs/outputs)."""
    poses_c2w = np.asarray(poses_c2w, np.float32)
    n = poses_c2w.shape[0]
    w2c = lie.sim3_inv(lie.se3_to_sim3(jnp.asarray(poses_c2w)))
    Ginv = lie.sim3_log(w2c)
    kk = np.arange(1, n)
    ll = kk - 1
    dSij = lie.sim3_mul(w2c[ll], lie.sim3_inv(w2c[kk]))
    constants = jnp.concatenate(
        [dSij, jnp.asarray(loop_constants, jnp.float32)], axis=0)
    iii = jnp.asarray(np.concatenate([kk, np.asarray(loop_ii)]), jnp.int32)
    jjj = jnp.asarray(np.concatenate([ll, np.asarray(loop_jj)]), jnp.int32)
    Ginv = _device_lm(Ginv, constants, iii, jjj, n, iters=iters, ep=ep,
                      lmbda0=lmbda)
    return np.asarray(lie.sim3_inv(lie.sim3_exp(Ginv)))
