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
