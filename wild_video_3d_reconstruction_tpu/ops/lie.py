"""Lie-group operations (SO3 / SE3 / RxSO3 / Sim3) in pure JAX.

TPU-native replacement for the reference's lietorch C++/CUDA backends
(`/root/reference/dpvo/lietorch/src/*.cpp|.cu`, `include/{so3,se3,rxso3,sim3}.h`).
These are tiny elementwise ops; XLA fuses them into surrounding computation, so
no custom kernels are needed (SURVEY.md section 7, stage 1).

Data layouts match lietorch's embedding conventions so that state tensors are
interchangeable with the reference:

  SO3   data[..., 4] = (qx, qy, qz, qw)
  SE3   data[..., 7] = (tx, ty, tz, qx, qy, qz, qw)        tangent (tau, phi)
  RxSO3 data[..., 5] = (qx, qy, qz, qw, s)                 tangent (phi, sigma)
  Sim3  data[..., 8] = (tx, ty, tz, qx, qy, qz, qw, s)     tangent (tau, phi, sigma)

Quaternions are Hamilton, (x, y, z, w) storage, acting as X' = R X + t.
Adjoint convention follows lietorch `include/se3.h:58-66`:
    Ad = [[R, [t]x R], [0, R]],   AdjT(a) = Ad^T a.

All functions broadcast over arbitrary leading batch dimensions and are
numerically safe near the identity (double-`where` Taylor guards so that both
the primal and its autodiff derivatives are finite at theta == 0; mirrors the
Taylor fallbacks in the reference `fastba/ba_cuda.cu:70-135`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Small-angle threshold. Values below this use the Taylor expansion branch.
_EPS = 1e-6


def _safe_sqrt(x):
    """sqrt with zero-safe gradient at x == 0 (double-where trick)."""
    safe = jnp.where(x > 0, x, 1.0)
    return jnp.where(x > 0, jnp.sqrt(safe), 0.0)


# ---------------------------------------------------------------------------
# quaternion primitives (x, y, z, w)
# ---------------------------------------------------------------------------

def quat_mul(q1, q2):
    """Hamilton product q1 ⊗ q2, (x,y,z,w) layout."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
        w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ], axis=-1)


def quat_conj(q):
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q, p):
    """Rotate 3-vector(s) p by unit quaternion q. Mirrors `actSO3`."""
    v = q[..., :3]
    w = q[..., 3:4]
    uv = 2.0 * jnp.cross(v, p)
    return p + w * uv + jnp.cross(v, uv)


def quat_to_matrix(q):
    """Unit quaternion -> 3x3 rotation matrix."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(R):
    """3x3 rotation matrix -> unit quaternion (x,y,z,w).

    Branch-free best-conditioned-candidate selection (same approach as the
    reference's `utils.matrix_to_quaternion`, `dpvo/utils.py:118-177`, but
    returning (x,y,z,w) order).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    q_abs = _safe_sqrt(jnp.stack([
        1.0 + m00 + m11 + m22,
        1.0 + m00 - m11 - m22,
        1.0 - m00 + m11 - m22,
        1.0 - m00 - m11 + m22,
    ], axis=-1))

    # candidates in (w, x, y, z) order, each scaled by its q_abs component
    cand = jnp.stack([
        jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], -1),
        jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], -1),
        jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], -1),
        jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], -1),
    ], axis=-2)
    denom = 2.0 * jnp.maximum(q_abs[..., None], 0.1)
    cand = cand / denom
    best = jnp.argmax(q_abs, axis=-1)
    wxyz = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)
    wxyz = wxyz[..., 0, :]
    wxyz = jnp.where(wxyz[..., :1] < 0, -wxyz, wxyz)  # standardize w >= 0
    return wxyz[..., [1, 2, 3, 0]]


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def so3_exp(phi):
    """so(3) -> SO(3): rotation vector to unit quaternion.

    Matches `expSO3` (`fastba/ba_cuda.cu:70-92`) including the Taylor branch.
    """
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = _safe_sqrt(theta_sq)
    theta_p4 = theta_sq * theta_sq
    small = theta_sq < 1e-8
    imag_t = 0.5 - (1.0 / 48.0) * theta_sq + (1.0 / 3840.0) * theta_p4
    real_t = 1.0 - (1.0 / 8.0) * theta_sq + (1.0 / 384.0) * theta_p4
    safe_theta = jnp.where(small, 1.0, theta)
    imag_b = jnp.sin(0.5 * safe_theta) / safe_theta
    real_b = jnp.cos(0.5 * safe_theta)
    imag = jnp.where(small, imag_t, imag_b)
    real = jnp.where(small, real_t, real_b)
    return jnp.concatenate([imag * phi, real], axis=-1)


def so3_log(q):
    """SO(3) -> so(3): unit quaternion to rotation vector."""
    v = q[..., :3]
    w = q[..., 3:4]
    n_sq = jnp.sum(v * v, axis=-1, keepdims=True)
    n = _safe_sqrt(n_sq)
    small = n < _EPS
    # angle = 2 atan2(n, w); factor = angle / n, with Taylor 2/w (1 - n^2/(3 w^2))
    safe_n = jnp.where(small, 1.0, n)
    # keep w away from 0 in the Taylor branch denominator (only used when n~0,
    # where |w|~1)
    safe_w = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
    factor_b = 2.0 * jnp.arctan2(n, w) / safe_n
    factor_t = 2.0 / safe_w * (1.0 - n_sq / (3.0 * safe_w * safe_w))
    factor = jnp.where(small, factor_t, factor_b)
    return factor * v


def so3_left_jacobian_terms(phi):
    """Coefficients (a, b) with V = I + a [phi]x + b [phi]x^2 (left Jacobian).

    a = (1 - cos t)/t^2, b = (t - sin t)/t^3; Taylor guarded. These mirror
    `expSE3` in `fastba/ba_cuda.cu:107-135`.
    """
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = _safe_sqrt(theta_sq)
    small = theta < 1e-4
    safe_sq = jnp.where(small, 1.0, theta_sq)
    safe_t = jnp.where(small, 1.0, theta)
    a_b = (1.0 - jnp.cos(safe_t)) / safe_sq
    b_b = (safe_t - jnp.sin(safe_t)) / (safe_t * safe_sq)
    a_t = 0.5 - theta_sq / 24.0
    b_t = 1.0 / 6.0 - theta_sq / 120.0
    return jnp.where(small, a_t, a_b), jnp.where(small, b_t, b_b)


def _apply_V(phi, tau, a, b):
    """(I + a [phi]x + b [phi]x^2) tau without forming matrices."""
    c1 = jnp.cross(phi, tau)
    c2 = jnp.cross(phi, c1)
    return tau + a * c1 + b * c2


def so3_inv_left_jacobian_coeff(phi):
    """Coefficient c with V^-1 = I - 1/2 [phi]x + c [phi]x^2."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = _safe_sqrt(theta_sq)
    small = theta < 1e-4
    safe_sq = jnp.where(small, 1.0, theta_sq)
    safe_t = jnp.where(small, 1.0, theta)
    half = 0.5 * safe_t
    cot = jnp.cos(half) / jnp.where(small, 1.0, jnp.sin(half))
    c_b = (1.0 - half * cot) / safe_sq
    c_t = 1.0 / 12.0 + theta_sq / 720.0
    return jnp.where(small, c_t, c_b)


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

def se3_identity(batch_shape=(), dtype=jnp.float32):
    data = jnp.zeros(tuple(batch_shape) + (7,), dtype=dtype)
    return data.at[..., 6].set(1.0)


def se3_exp(xi):
    """se(3) tangent (tau, phi) -> SE3 data. Mirrors `expSE3`."""
    tau, phi = xi[..., :3], xi[..., 3:6]
    q = so3_exp(phi)
    a, b = so3_left_jacobian_terms(phi)
    t = _apply_V(phi, tau, a, b)
    return jnp.concatenate([t, q], axis=-1)


def se3_log(X):
    t, q = X[..., :3], X[..., 3:7]
    phi = so3_log(q)
    c = so3_inv_left_jacobian_coeff(phi)
    c1 = jnp.cross(phi, t)
    c2 = jnp.cross(phi, c1)
    tau = t - 0.5 * c1 + c * c2
    return jnp.concatenate([tau, phi], axis=-1)


def se3_inv(X):
    t, q = X[..., :3], X[..., 3:7]
    qinv = quat_conj(q)
    return jnp.concatenate([-quat_rotate(qinv, t), qinv], axis=-1)


def se3_mul(X1, X2):
    t1, q1 = X1[..., :3], X1[..., 3:7]
    t2, q2 = X2[..., :3], X2[..., 3:7]
    return jnp.concatenate([t1 + quat_rotate(q1, t2), quat_mul(q1, q2)], axis=-1)


def se3_act(X, p):
    """Act on 3-points: R p + t."""
    return quat_rotate(X[..., 3:7], p) + X[..., :3]


def se3_act4(X, p4):
    """Act on homogeneous (x, y, z, w): (R v + w t, w).

    This is how patches (with inverse depth in the 4th slot) are transformed;
    mirrors `actSE3` (`fastba/ba_cuda.cu:30-37`).
    """
    v, w = p4[..., :3], p4[..., 3:4]
    return jnp.concatenate([quat_rotate(X[..., 3:7], v) + w * X[..., :3], w], axis=-1)


def se3_adj(X, a):
    """Adjoint action Ad_X a, lietorch convention (se3.h:58-66)."""
    t, q = X[..., :3], X[..., 3:7]
    at, aw = a[..., :3], a[..., 3:6]
    Raw = quat_rotate(q, aw)
    return jnp.concatenate([quat_rotate(q, at) + jnp.cross(t, Raw), Raw], axis=-1)


def se3_adjT(X, a):
    """Transposed adjoint Ad_X^T a = (R^T a_t, R^T (a_w - t x a_t)).

    Matches `adjSE3` in `fastba/ba_cuda.cu:39-54` and lietorch AdjT.
    """
    t, q = X[..., :3], X[..., 3:7]
    qinv = quat_conj(q)
    at, aw = a[..., :3], a[..., 3:6]
    return jnp.concatenate([
        quat_rotate(qinv, at),
        quat_rotate(qinv, aw - jnp.cross(t, at)),
    ], axis=-1)


def se3_matrix(X):
    """SE3 data -> 4x4 homogeneous matrix."""
    R = quat_to_matrix(X[..., 3:7])
    t = X[..., :3]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(T):
    q = matrix_to_quat(T[..., :3, :3])
    return jnp.concatenate([T[..., :3, 3], q], axis=-1)


def se3_retr(X, xi):
    """Manifold retraction exp(xi) * X (left-multiplied update).

    Matches `retrSE3` (`fastba/ba_cuda.cu:139-156`) and lietorch `.retr()`.
    """
    return se3_mul(se3_exp(xi), X)


def se3_scale(X, s):
    """Scale translation by s (lietorch SE3.scale, used in depth/pose rescaling)."""
    s = jnp.asarray(s)[..., None] if jnp.ndim(s) > 0 else s
    return jnp.concatenate([X[..., :3] * s, X[..., 3:7]], axis=-1)


def se3_normalize(X):
    """Renormalize the quaternion part (guards against fp drift)."""
    t, q = X[..., :3], X[..., 3:7]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.concatenate([t, q], axis=-1)


# ---------------------------------------------------------------------------
# RxSO3 (rotation + scale)
# ---------------------------------------------------------------------------

def rxso3_exp(phisig):
    phi, sigma = phisig[..., :3], phisig[..., 3:4]
    return jnp.concatenate([so3_exp(phi), jnp.exp(sigma)], axis=-1)


def rxso3_log(X):
    return jnp.concatenate([so3_log(X[..., :4]), jnp.log(X[..., 4:5])], axis=-1)


def rxso3_inv(X):
    return jnp.concatenate([quat_conj(X[..., :4]), 1.0 / X[..., 4:5]], axis=-1)


def rxso3_mul(X1, X2):
    return jnp.concatenate([
        quat_mul(X1[..., :4], X2[..., :4]), X1[..., 4:5] * X2[..., 4:5]], axis=-1)


def rxso3_act(X, p):
    return X[..., 4:5] * quat_rotate(X[..., :4], p)


# ---------------------------------------------------------------------------
# Sim(3)
# ---------------------------------------------------------------------------
# data = (t, q, s); tangent = (tau, phi, sigma). Used by the loop-closure
# pose-graph optimizer (replaces pypose Sim3 + cuda_ba.solve_system,
# `dpvo/loop_closure/optim_utils.py`).

def sim3_identity(batch_shape=(), dtype=jnp.float32):
    data = jnp.zeros(tuple(batch_shape) + (8,), dtype=dtype)
    return data.at[..., 6].set(1.0).at[..., 7].set(1.0)


def _sim3_W_terms(phi, sigma):
    """Coefficients (A, B, C) of W = C I + A [phi]x + B [phi]x^2 for Sim3 exp.

    Standard Sophus closed forms with Taylor guards:
      s = e^sigma
      C = (s - 1)/sigma
      A, B: mixed scale-rotation integrals.
    """
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = _safe_sqrt(theta_sq)
    s = jnp.exp(sigma)

    small_sig = jnp.abs(sigma) < _EPS
    small_th = theta < _EPS
    safe_sig = jnp.where(small_sig, 1.0, sigma)
    safe_th = jnp.where(small_th, 1.0, theta)
    safe_th_sq = safe_th * safe_th

    C = jnp.where(small_sig, 1.0 + 0.5 * sigma + sigma * sigma / 6.0,
                  (s - 1.0) / safe_sig)

    sin_t, cos_t = jnp.sin(safe_th), jnp.cos(safe_th)

    # both sigma and theta general:
    a_gen = s * sin_t
    b_gen = s * cos_t
    denom = jnp.where(small_sig & small_th, 1.0, safe_sig * safe_sig + safe_th_sq)
    A_gen = (a_gen * safe_sig + (1.0 - b_gen) * safe_th) / (safe_th * denom)
    B_gen = (C - ((b_gen - 1.0) * safe_sig + a_gen * safe_th) / denom) / safe_th_sq

    # sigma ~ 0, theta general:
    A_s0 = (1.0 - cos_t) / safe_th_sq
    B_s0 = (safe_th - sin_t) / (safe_th_sq * safe_th)

    # theta ~ 0, sigma general:
    A_t0 = ((safe_sig - 1.0) * s + 1.0) / (safe_sig * safe_sig)
    B_t0 = (s * (0.5 * safe_sig * safe_sig - safe_sig + 1.0) - 1.0) / (
        safe_sig * safe_sig * safe_sig)

    # both small:
    A_00 = 0.5 + sigma / 6.0
    B_00 = 1.0 / 6.0 + sigma / 24.0

    A = jnp.where(small_sig & small_th, A_00,
                  jnp.where(small_sig, A_s0, jnp.where(small_th, A_t0, A_gen)))
    B = jnp.where(small_sig & small_th, B_00,
                  jnp.where(small_sig, B_s0, jnp.where(small_th, B_t0, B_gen)))
    return A, B, C


def sim3_exp(xi):
    """sim(3) tangent (tau, phi, sigma) -> Sim3 data."""
    tau, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6:7]
    q = so3_exp(phi)
    s = jnp.exp(sigma)
    A, B, C = _sim3_W_terms(phi, sigma)
    c1 = jnp.cross(phi, tau)
    c2 = jnp.cross(phi, c1)
    t = C * tau + A * c1 + B * c2
    return jnp.concatenate([t, q, s], axis=-1)


def sim3_log(X):
    t, q, s = X[..., :3], X[..., 3:7], X[..., 7:8]
    phi = so3_log(q)
    sigma = jnp.log(s)
    A, B, C = _sim3_W_terms(phi, sigma)
    # Invert W = C I + A [phi]x + B [phi]x^2 acting on t. Using the identity
    # [phi]x^3 = -theta^2 [phi]x, W^-1 = a I + b [phi]x + c [phi]x^2 with
    # coefficients solved from (C, A, B) and theta^2.
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    # Solve the 3 coefficients of the inverse in the commutative subalgebra
    # span{I, P, P^2} where P = [phi]x, P^3 = -th2 P, P^4 = -th2 P^2:
    #   (C I + A P + B P^2)(a I + b P + c P^2) = I
    #   I:   C a = 1 - term? expand:
    #   => C a = 1
    #   => C b + A a - th2 (A c + B b) = 0
    #   => C c + A b + B a - th2 B c = 0
    th2 = theta_sq
    a = 1.0 / C
    # linear system in (b, c):
    #   (C - th2 B) b  - th2 A c = -A a
    #   A b + (C - th2 B) c = -B a
    m11 = C - th2 * B
    m12 = -th2 * A
    m21 = A
    m22 = C - th2 * B
    det = m11 * m22 - m12 * m21
    safe_det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    r1 = -A * a
    r2 = -B * a
    b = (r1 * m22 - m12 * r2) / safe_det
    c = (m11 * r2 - r1 * m21) / safe_det
    c1 = jnp.cross(phi, t)
    c2 = jnp.cross(phi, c1)
    tau = a * t + b * c1 + c * c2
    return jnp.concatenate([tau, phi, sigma], axis=-1)


def sim3_inv(X):
    t, q, s = X[..., :3], X[..., 3:7], X[..., 7:8]
    qinv = quat_conj(q)
    sinv = 1.0 / s
    return jnp.concatenate([-sinv * quat_rotate(qinv, t), qinv, sinv], axis=-1)


def sim3_mul(X1, X2):
    t1, q1, s1 = X1[..., :3], X1[..., 3:7], X1[..., 7:8]
    t2, q2, s2 = X2[..., :3], X2[..., 3:7], X2[..., 7:8]
    return jnp.concatenate([
        t1 + s1 * quat_rotate(q1, t2),
        quat_mul(q1, q2),
        s1 * s2,
    ], axis=-1)


def sim3_act(X, p):
    return X[..., 7:8] * quat_rotate(X[..., 3:7], p) + X[..., :3]


def sim3_act4(X, p4):
    v, w = p4[..., :3], p4[..., 3:4]
    return jnp.concatenate([
        X[..., 7:8] * quat_rotate(X[..., 3:7], v) + w * X[..., :3], w], axis=-1)


def sim3_matrix(X):
    R = quat_to_matrix(X[..., 3:7]) * X[..., 7:8, None]
    t = X[..., :3]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def sim3_retr(X, xi):
    return sim3_mul(sim3_exp(xi), X)


def se3_to_sim3(X, s=None):
    """Embed SE3 into Sim3 with scale s (default 1)."""
    one = jnp.ones_like(X[..., :1]) if s is None else jnp.broadcast_to(
        jnp.asarray(s, X.dtype), X[..., :1].shape)
    return jnp.concatenate([X[..., :7], one], axis=-1)


def sim3_to_se3(X):
    """Drop the scale (after applying it to translation is NOT done; caller
    decides how to handle scale)."""
    return X[..., :7]
