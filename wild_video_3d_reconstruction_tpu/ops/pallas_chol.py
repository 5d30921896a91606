"""Single-kernel Cholesky solve for the BA Schur system (Pallas TPU).

MEASURED DEAD END for the SLAM hot path (r5), kept as a tested
primitive: standalone timings suggested cho_factor+cho_solve on the
[6W, 6W] Schur complement cost ~1.5 ms on v5e, but that reading was the
~0.87 ms per-dispatch relay floor — an 8-deep dependent chain of scipy
solves runs in 0.85 ms total (~0.11 ms/solve in-program), and this
kernel times EQUAL (0.12 ms/solve in-chain). The r4 VERDICT's "overlap
the two sequential [72,72] Cholesky latencies" item is therefore moot:
XLA's solve is already cheap in-program. The kernel remains useful
where many small independent SPD systems must be solved without XLA's
blocked-factorization op chain (e.g., future per-patch covariance
solves). Reference analogue: `dpvo/fastba/ba_cuda.cu:516-520`
(cuSOLVER potrf/potrs on the same system).

Mosaic cannot dynamically slice single lanes/sublanes, so rows and
columns are extracted with iota-compare masked reductions; the trailing
rank-1 update exploits that the Schur complement stays SYMMETRIC, so the
column u and row u^T are both plain masked reductions of the SAME
matrix (no in-kernel transpose anywhere).

Exactness: same classical algorithm as LAPACK potrf/potrs modulo fp
summation order; parity vs scipy is pinned in tests/test_pallas_chol.py
(interpret mode) to ~1e-5 relative.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_solve_kernel(s_ref, y_ref, x_ref):
    D = s_ref.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)

    # ---- factorization: right-looking masked rank-1 updates -------------
    def fact_step(k, carry):
        A, L = carry
        dkk = jnp.sum(jnp.where((row_ids == k) & (col_ids == k), A, 0.0))
        inv_sqrt = jax.lax.rsqrt(dkk)
        u_col = jnp.sum(jnp.where(col_ids == k, A, 0.0), axis=1,
                        keepdims=True)                    # [D, 1] = A[:, k]
        u_col = jnp.where(sub_ids >= k, u_col, 0.0)
        u_row = jnp.sum(jnp.where(row_ids == k, A, 0.0), axis=0,
                        keepdims=True)                    # [1, D] = A[k, :]
        u_row = jnp.where(lane_ids >= k, u_row, 0.0)
        L = L + jnp.where(col_ids == k, u_col * inv_sqrt, 0.0)
        A = A - u_col * (u_row / dkk)
        return A, L

    A0 = s_ref[:].astype(jnp.float32)
    _, L = jax.lax.fori_loop(0, D, fact_step,
                             (A0, jnp.zeros((D, D), jnp.float32)))

    # ---- forward substitution: L z = y (z kept as a lane row) -----------
    y_row = y_ref[:]                                      # [1, D]

    def fwd_step(k, z):
        l_row = jnp.sum(jnp.where(row_ids == k, L, 0.0), axis=0,
                        keepdims=True)                    # [1, D] = L[k, :]
        lkk = jnp.sum(jnp.where(lane_ids == k, l_row, 0.0))
        dot = jnp.sum(jnp.where(lane_ids < k, l_row * z, 0.0))
        yk = jnp.sum(jnp.where(lane_ids == k, y_row, 0.0))
        return z + jnp.where(lane_ids == k, (yk - dot) / lkk, 0.0)

    z_row = jax.lax.fori_loop(0, D, fwd_step, jnp.zeros((1, D), jnp.float32))

    # row -> column without a transpose: diagonal-mask broadcast + reduce
    z_col = jnp.sum(jnp.where(row_ids == col_ids, z_row, 0.0), axis=1,
                    keepdims=True)                        # [D, 1]

    # ---- back substitution: L^T x = z (x kept as a sublane column) ------
    def bwd_step(i, x):
        k = D - 1 - i
        l_col = jnp.sum(jnp.where(col_ids == k, L, 0.0), axis=1,
                        keepdims=True)                    # [D, 1] = L[:, k]
        lkk = jnp.sum(jnp.where(sub_ids == k, l_col, 0.0))
        dot = jnp.sum(jnp.where(sub_ids > k, l_col * x, 0.0))
        zk = jnp.sum(jnp.where(sub_ids == k, z_col, 0.0))
        return x + jnp.where(sub_ids == k, (zk - dot) / lkk, 0.0)

    x_col = jax.lax.fori_loop(0, D, bwd_step, jnp.zeros((D, 1), jnp.float32))
    x_ref[:] = x_col


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_solve_small(S, y, interpret=False):
    """Solve S x = y for SPD S [D, D] (D <= 256), one Pallas kernel.

    Drop-in for cho_factor+cho_solve in the BA Schur solve. Non-SPD /
    singular inputs produce NaNs (rsqrt of a non-positive pivot), which
    the caller's finite-check containment handles exactly as it does for
    the scipy path (`ba/gauss_newton.py` "Cholesky failure containment").
    """
    D = S.shape[0]
    assert S.shape == (D, D) and y.shape == (D,) and D <= 256
    x = pl.pallas_call(
        _chol_solve_kernel,
        out_shape=jax.ShapeDtypeStruct((D, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(S.astype(jnp.float32), y.astype(jnp.float32).reshape(1, D))
    return x.reshape(D)
