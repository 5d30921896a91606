"""Pallas single-kernel Cholesky solve vs scipy (interpret mode on CPU).

The BA Schur solve replaces cho_factor+cho_solve with
`ops.pallas_chol.chol_solve_small` on TPU (~1.5 ms of XLA dispatch
latency for a 72x72 system -> one VMEM kernel); this pins numerical
parity and the NaN containment contract.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wild_video_3d_reconstruction_tpu.ops.pallas_chol import chol_solve_small

INTERPRET = jax.default_backend() == "cpu"


@pytest.mark.parametrize("d", [8, 72, 128])
def test_matches_scipy(d):
    rng = np.random.default_rng(d)
    A = rng.normal(size=(d, d)).astype(np.float32)
    S = A @ A.T + d * np.eye(d, dtype=np.float32)
    y = rng.normal(size=(d,)).astype(np.float32)

    ref = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(jnp.asarray(S), lower=True),
        jnp.asarray(y))
    got = chol_solve_small(jnp.asarray(S), jnp.asarray(y),
                           interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_residual_small():
    rng = np.random.default_rng(0)
    d = 72
    A = rng.normal(size=(d, d)).astype(np.float32)
    S = A @ A.T + 10.0 * np.eye(d, dtype=np.float32)
    y = rng.normal(size=(d,)).astype(np.float32)
    x = np.asarray(chol_solve_small(jnp.asarray(S), jnp.asarray(y),
                                    interpret=INTERPRET))
    r = S @ x - y
    assert np.linalg.norm(r) / np.linalg.norm(y) < 1e-4


def test_indefinite_produces_nan():
    """Non-SPD input must yield NaNs (the BA containment contract:
    `ba/gauss_newton.py` zeroes the step when any(dX) is non-finite)."""
    d = 16
    S = -np.eye(d, dtype=np.float32)
    y = np.ones((d,), np.float32)
    x = np.asarray(chol_solve_small(jnp.asarray(S), jnp.asarray(y),
                                    interpret=INTERPRET))
    assert not np.all(np.isfinite(x))
