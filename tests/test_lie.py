"""Property tests for the Lie-group layer.

Ports the reference's lietorch test strategy (`dpvo/lietorch/run_tests.py`):
group identities (Log∘Exp = id, X X^-1 = I, adjoint identity, act == matrix
action) plus gradient checks via jax.test_util.check_grads, for all 4 groups.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from wild_video_3d_reconstruction_tpu.ops import lie
from wild_video_3d_reconstruction_tpu.ops.groups import SE3, SO3, RxSO3, Sim3

GROUPS = {
    "so3": (lie.so3_exp, lie.so3_log, lie.quat_conj, lie.quat_mul, 3, 4),
    "se3": (lie.se3_exp, lie.se3_log, lie.se3_inv, lie.se3_mul, 6, 7),
    "rxso3": (lie.rxso3_exp, lie.rxso3_log, lie.rxso3_inv, lie.rxso3_mul, 4, 5),
    "sim3": (lie.sim3_exp, lie.sim3_log, lie.sim3_inv, lie.sim3_mul, 7, 8),
}


def random_tangent(key, dim, batch=32, scale=1.0):
    return scale * jax.random.normal(key, (batch, dim), dtype=jnp.float64)


@pytest.fixture(autouse=True)
def _x64():
    with jax.enable_x64(True):
        yield


@pytest.mark.parametrize("name", list(GROUPS))
def test_exp_log_roundtrip(name):
    exp, log, *_ , dim, _ = GROUPS[name]
    key = jax.random.PRNGKey(0)
    x = random_tangent(key, dim)
    np.testing.assert_allclose(log(exp(x)), x, atol=1e-8)
    # small-angle branch
    xs = random_tangent(key, dim, scale=1e-5)
    np.testing.assert_allclose(log(exp(xs)), xs, atol=1e-10)
    # exactly zero
    z = jnp.zeros((4, dim), dtype=jnp.float64)
    np.testing.assert_allclose(log(exp(z)), z, atol=1e-12)


@pytest.mark.parametrize("name", list(GROUPS))
def test_inv_mul_identity(name):
    exp, log, inv, mul, dim, edim = GROUPS[name]
    x = exp(random_tangent(jax.random.PRNGKey(1), dim))
    ident = mul(x, inv(x))
    np.testing.assert_allclose(log(ident), np.zeros((32, dim)), atol=1e-8)


@pytest.mark.parametrize("name", list(GROUPS))
def test_associativity(name):
    exp, log, inv, mul, dim, _ = GROUPS[name]
    k = jax.random.PRNGKey(2)
    a, b, c = (exp(random_tangent(jax.random.fold_in(k, i), dim)) for i in range(3))
    lhs = mul(mul(a, b), c)
    rhs = mul(a, mul(b, c))
    np.testing.assert_allclose(lhs, rhs, atol=1e-8)


def test_se3_act_matches_matrix():
    key = jax.random.PRNGKey(3)
    X = lie.se3_exp(random_tangent(key, 6, batch=8))
    p = jax.random.normal(jax.random.fold_in(key, 1), (8, 3), dtype=jnp.float64)
    T = lie.se3_matrix(X)
    expected = jnp.einsum("bij,bj->bi", T[:, :3, :3], p) + T[:, :3, 3]
    np.testing.assert_allclose(lie.se3_act(X, p), expected, atol=1e-8)
    # act4 with homogeneous weight
    p4 = jnp.concatenate([p, jnp.ones((8, 1))], axis=-1)
    out4 = lie.se3_act4(X, p4)
    np.testing.assert_allclose(out4[..., :3], expected, atol=1e-8)


def test_sim3_act_matches_matrix():
    key = jax.random.PRNGKey(4)
    X = lie.sim3_exp(random_tangent(key, 7, batch=8))
    p = jax.random.normal(jax.random.fold_in(key, 1), (8, 3), dtype=jnp.float64)
    T = lie.sim3_matrix(X)
    expected = jnp.einsum("bij,bj->bi", T[:, :3, :3], p) + T[:, :3, 3]
    np.testing.assert_allclose(lie.sim3_act(X, p), expected, atol=1e-8)


def test_se3_adjoint_identity():
    # Adj identity: X * exp(a) == exp(Adj_X a) * X
    key = jax.random.PRNGKey(5)
    X = lie.se3_exp(random_tangent(key, 6, batch=8))
    a = random_tangent(jax.random.fold_in(key, 1), 6, batch=8, scale=0.1)
    lhs = lie.se3_mul(X, lie.se3_exp(a))
    rhs = lie.se3_mul(lie.se3_exp(lie.se3_adj(X, a)), X)
    np.testing.assert_allclose(lie.se3_log(lie.se3_mul(lhs, lie.se3_inv(rhs))),
                               np.zeros((8, 6)), atol=1e-7)


def test_se3_adjT_is_transpose():
    key = jax.random.PRNGKey(6)
    X = lie.se3_exp(random_tangent(key, 6, batch=8))
    a = random_tangent(jax.random.fold_in(key, 1), 6, batch=8)
    b = random_tangent(jax.random.fold_in(key, 2), 6, batch=8)
    lhs = jnp.sum(lie.se3_adj(X, a) * b, axis=-1)
    rhs = jnp.sum(a * lie.se3_adjT(X, b), axis=-1)
    np.testing.assert_allclose(lhs, rhs, atol=1e-8)


def test_matrix_quat_roundtrip():
    key = jax.random.PRNGKey(7)
    q = lie.so3_exp(random_tangent(key, 3, batch=64))
    R = lie.quat_to_matrix(q)
    q2 = lie.matrix_to_quat(R)
    # same rotation up to sign
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, np.ones(64), atol=1e-8)


@pytest.mark.parametrize("name", ["so3", "se3", "sim3"])
def test_gradients(name):
    exp, log, inv, mul, dim, _ = GROUPS[name]
    key = jax.random.PRNGKey(8)
    x = random_tangent(key, dim, batch=4)
    check_grads(exp, (x,), order=1, modes=["rev"], atol=1e-3, rtol=1e-3)

    def roundtrip(t):
        return log(mul(exp(t), exp(x[:1])))

    t0 = random_tangent(jax.random.fold_in(key, 1), dim, batch=1, scale=0.3)
    check_grads(roundtrip, (t0,), order=1, modes=["rev"], atol=1e-3, rtol=1e-3)


def test_gradients_at_zero():
    # derivative of exp at exactly 0 must be finite (double-where guards)
    for name in ["so3", "se3", "sim3"]:
        exp, _, _, _, dim, _ = GROUPS[name]
        z = jnp.zeros((dim,), dtype=jnp.float64)
        J = jax.jacobian(exp)(z)
        assert np.all(np.isfinite(J)), name


def test_class_wrappers():
    key = jax.random.PRNGKey(9)
    X = SE3.exp(random_tangent(key, 6, batch=5))
    Y = SE3.exp(random_tangent(jax.random.fold_in(key, 1), 6, batch=5))
    Z = X * Y
    np.testing.assert_allclose(Z.data, lie.se3_mul(X.data, Y.data), atol=1e-12)
    p = jax.random.normal(jax.random.fold_in(key, 2), (5, 3), dtype=jnp.float64)
    np.testing.assert_allclose(X * p, lie.se3_act(X.data, p), atol=1e-12)
    ident = SE3.Identity(5, dtype=jnp.float64)
    np.testing.assert_allclose((X * X.inv()).data, ident.data, atol=1e-8)
    # retr consistency
    xi = random_tangent(jax.random.fold_in(key, 3), 6, batch=5, scale=0.1)
    np.testing.assert_allclose(X.retr(xi).data,
                               lie.se3_mul(lie.se3_exp(xi), X.data), atol=1e-12)
    # jit through pytree
    f = jax.jit(lambda g: (g * g.inv()).data)
    np.testing.assert_allclose(f(X), ident.data, atol=1e-7)


def test_sim3_scale_composition():
    # pure scaling composes multiplicatively
    xi = jnp.zeros((7,), dtype=jnp.float64).at[6].set(0.5)
    X = Sim3.exp(xi)
    Y = X * X
    assert np.isclose(Y.data[7], np.exp(1.0))
    p = jnp.asarray([1.0, 2.0, 3.0])
    np.testing.assert_allclose(X * p, np.exp(0.5) * p, atol=1e-10)
