"""Thin class wrappers over `ops.lie` mirroring the lietorch Python API.

The reference exposes `SE3 / SO3 / RxSO3 / Sim3` classes with `exp/log/inv/
mul/act/adj/adjT/matrix/retr` (`dpvo/lietorch/groups.py:51-322`). The SLAM
layer reads far more naturally with that API, so we provide equivalent
wrappers around the pure-functional ops. They are registered as pytrees so
they can flow through jit/vmap/scan unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import lie


class _LieGroup:
    """Base wrapper; subclasses bind the functional ops."""

    embedded_dim = None
    manifold_dim = None

    def __init__(self, data):
        self.data = jnp.asarray(data)

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.data = children[0]
        return obj

    # -- common API ---------------------------------------------------------
    @property
    def shape(self):
        return self.data.shape[:-1]

    def __getitem__(self, index):
        return type(self)(self.data[index])

    def __repr__(self):
        return f"{type(self).__name__}(shape={self.shape})"

    @classmethod
    def Identity(cls, *batch_shape, dtype=jnp.float32):
        if batch_shape and isinstance(batch_shape[0], (tuple, list)):
            batch_shape = tuple(batch_shape[0])
        data = jnp.zeros(tuple(batch_shape) + (cls.embedded_dim,), dtype=dtype)
        return cls(data + cls._id_elem(dtype))

    @classmethod
    def IdentityLike(cls, G):
        return cls.Identity(G.shape, dtype=G.data.dtype)

    def vec(self):
        return self.data

    def matrix(self):
        return self._matrix(self.data)

    def inv(self):
        return type(self)(self._inv(self.data))

    def log(self):
        return self._log(self.data)

    @classmethod
    def exp(cls, xi):
        return cls(cls._exp(xi))

    def retr(self, xi):
        return type(self)(self._mul(self._exp(xi), self.data))

    def mul(self, other):
        return type(self)(self._mul(self.data, other.data))

    def __mul__(self, other):
        if isinstance(other, _LieGroup):
            return self.mul(other)
        other = jnp.asarray(other)
        if other.shape[-1] == 3:
            return self._act(self.data, other)
        if other.shape[-1] == 4:
            return self._act4(self.data, other)
        raise ValueError(f"cannot act on array with trailing dim {other.shape[-1]}")

    def act(self, p):
        return self._act(self.data, p)


@jax.tree_util.register_pytree_node_class
class SO3(_LieGroup):
    embedded_dim, manifold_dim = 4, 3
    _exp = staticmethod(lie.so3_exp)
    _log = staticmethod(lie.so3_log)
    _inv = staticmethod(lie.quat_conj)
    _mul = staticmethod(lie.quat_mul)
    _act = staticmethod(lie.quat_rotate)
    _matrix = staticmethod(lie.quat_to_matrix)

    @staticmethod
    def _act4(data, p4):
        return jnp.concatenate([lie.quat_rotate(data, p4[..., :3]), p4[..., 3:4]], -1)

    @staticmethod
    def _id_elem(dtype):
        return jnp.asarray([0, 0, 0, 1], dtype=dtype)


@jax.tree_util.register_pytree_node_class
class SE3(_LieGroup):
    embedded_dim, manifold_dim = 7, 6
    _exp = staticmethod(lie.se3_exp)
    _log = staticmethod(lie.se3_log)
    _inv = staticmethod(lie.se3_inv)
    _mul = staticmethod(lie.se3_mul)
    _act = staticmethod(lie.se3_act)
    _act4 = staticmethod(lie.se3_act4)
    _matrix = staticmethod(lie.se3_matrix)

    @staticmethod
    def _id_elem(dtype):
        return jnp.asarray([0, 0, 0, 0, 0, 0, 1], dtype=dtype)

    def adj(self, a):
        return lie.se3_adj(self.data, a)

    def adjT(self, a):
        return lie.se3_adjT(self.data, a)

    def scale(self, s):
        return SE3(lie.se3_scale(self.data, s))

    def translation(self):
        return self.data[..., :3]

    @classmethod
    def from_matrix(cls, T):
        return cls(lie.se3_from_matrix(T))


@jax.tree_util.register_pytree_node_class
class RxSO3(_LieGroup):
    embedded_dim, manifold_dim = 5, 4
    _exp = staticmethod(lie.rxso3_exp)
    _log = staticmethod(lie.rxso3_log)
    _inv = staticmethod(lie.rxso3_inv)
    _mul = staticmethod(lie.rxso3_mul)
    _act = staticmethod(lie.rxso3_act)

    @staticmethod
    def _act4(data, p4):
        return jnp.concatenate([lie.rxso3_act(data, p4[..., :3]), p4[..., 3:4]], -1)

    @staticmethod
    def _matrix(data):
        return lie.quat_to_matrix(data[..., :4]) * data[..., 4:5, None]

    @staticmethod
    def _id_elem(dtype):
        return jnp.asarray([0, 0, 0, 1, 1], dtype=dtype)


@jax.tree_util.register_pytree_node_class
class Sim3(_LieGroup):
    embedded_dim, manifold_dim = 8, 7
    _exp = staticmethod(lie.sim3_exp)
    _log = staticmethod(lie.sim3_log)
    _inv = staticmethod(lie.sim3_inv)
    _mul = staticmethod(lie.sim3_mul)
    _act = staticmethod(lie.sim3_act)
    _act4 = staticmethod(lie.sim3_act4)
    _matrix = staticmethod(lie.sim3_matrix)

    @staticmethod
    def _id_elem(dtype):
        return jnp.asarray([0, 0, 0, 0, 0, 0, 1, 1], dtype=dtype)

    @classmethod
    def from_se3(cls, X, s=None):
        data = X.data if isinstance(X, SE3) else jnp.asarray(X)
        return cls(lie.se3_to_sim3(data, s))


def stack(groups, dim=0):
    """lietorch.stack equivalent."""
    cls = type(groups[0])
    return cls(jnp.stack([g.data for g in groups], axis=dim))
