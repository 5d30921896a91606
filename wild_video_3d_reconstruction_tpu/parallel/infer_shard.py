"""Multi-chip inference sharding: edge-parallel correlation.

Parity with the reference needs one chip (SURVEY §2.1: the reference has
no multi-device parallelism), but the natural ICI scaling axis for the
tracking loop is the edge dimension — reprojection and the correlation
pyramid are embarrassingly parallel per edge while the feature maps are
small and replicable (SURVEY §5 "long-context" note). This module shards
that region with `shard_map` over a 1-D `edges` mesh axis:

  * poses/patches/feature pyramids: replicated (a few MB),
  * coords/kk/jj/valid: sharded on edges,
  * output correlation features: sharded on edges (the update operator
    can consume them sharded, or all-gather for the replicated SoftAgg).

Per-shard compute calls the same single-chip kernels (the Pallas kernel
on TPU, the XLA oracle elsewhere), so numerics are identical to the
unsharded path — proven by `tests/test_parallel.py`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def make_edge_mesh(n_devices=None):
    devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), ("edges",))


def sharded_patch_corr(mesh, gmap, pyramid, coords, kk, jj, valid,
                       radius=3, chunk=512, gather=True):
    """Edge-sharded correlation pyramid.

    Same contract as `ops.corr.patch_corr_pyramid` / the Pallas kernel;
    E must divide by the mesh size (pad with invalid rows otherwise).
    gather=False returns the result still sharded on edges.
    """
    from ..ops.corr import patch_corr_pyramid

    n = mesh.shape["edges"]
    E = coords.shape[0]
    assert E % n == 0, f"pad edges to a multiple of the mesh size ({n})"

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P("edges"), P("edges"), P("edges"),
                  P("edges")),
        out_specs=P(None) if gather else P("edges"),
        check_rep=False)
    def body(gmap_, f1, f2, coords_, kk_, jj_, valid_):
        out = patch_corr_pyramid(gmap_, (f1, f2), coords_, kk_, jj_,
                                 radius=radius, valid=valid_, chunk=chunk)
        if gather:
            out = jax.lax.all_gather(out, "edges", axis=0, tiled=True)
        return out

    return body(gmap, pyramid[0], pyramid[1], coords, kk, jj, valid)
