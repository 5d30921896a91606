"""Device mesh construction and parameter sharding rules.

The reference has no multi-device parallelism (SURVEY.md section 2.1); the
TPU rebuild scales training over a `jax.sharding.Mesh` with three axes:

  dp    data parallel over clips (gradient psum rides ICI)
  fsdp  parameter/optimizer sharding over the input dim of large matmuls
        (all-gathered on use, reduce-scattered on grad)
  tp    tensor parallel over the output dim of the 384-wide update MLPs
        and encoder output channels

A VO network has no experts and the recurrence is latency-bound rather than
memory-bound, so ep/pp axes are intentionally not used; dp x fsdp x tp covers
the realistic scaling regimes. XLA inserts all collectives from the sharding
annotations (GSPMD) — no hand-written NCCL-style code, per the scaling-book
recipe.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("dp", "fsdp", "tp")


def make_mesh(n_devices=None, devices=None):
    devices = devices if devices is not None else jax.devices()[:n_devices]
    n = len(devices)
    # factor n into (dp, fsdp, tp), preferring tp=2 then fsdp=2 then dp
    tp = 2 if n % 2 == 0 else 1
    rem = n // tp
    fsdp = 2 if rem % 2 == 0 else 1
    dp = rem // fsdp
    mesh_devices = np.asarray(devices).reshape(dp, fsdp, tp)
    return Mesh(mesh_devices, AXES)


def param_sharding(mesh, params):
    """NamedSharding tree: big linears (fsdp, tp), conv cout on tp,
    small params replicated."""

    def rule(x):
        if x.ndim == 2 and x.shape[0] >= 256 and x.shape[1] >= 256:
            return NamedSharding(mesh, P("fsdp", "tp"))
        if x.ndim == 2 and x.shape[1] >= 256:
            return NamedSharding(mesh, P(None, "tp"))
        if x.ndim == 4 and x.shape[3] >= 128:
            return NamedSharding(mesh, P(None, None, None, "tp"))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def batch_sharding(mesh):
    return NamedSharding(mesh, P("dp"))


def replicated(mesh):
    return NamedSharding(mesh, P())
