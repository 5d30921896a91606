"""The recurrent update operator over patch-graph edges.

Functional port of the reference `Update` module (`dpvo/net.py:28-93`):
correlation encoder MLP -> LayerNorm -> temporal neighbor message passing
(c1/c2 over prev/next edge of the same patch) -> SoftAgg over same-patch and
same-frame-pair groups -> 2x (LayerNorm + GatedResidual) "GRU" -> flow-delta
and confidence heads with gradient clipping.

Everything is batched over a fixed-size edge axis with a validity mask; the
dynamic grouping of the reference (torch.unique inside SoftAgg, CPU
`fastba.neighbors`) is hoisted to the caller as bounded segment ids + sorted
neighbor links (`ops.segment`), so the whole operator is one jit-compiled
dense program dominated by 384x384 MXU matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.segment import (segment_softmax_weighted_sum,
                           segment_softmax_weighted_sum_dense,
                           segment_softmax_weighted_sum_runsum,
                           segment_softmax_weighted_sum_table)
from .layers import (gradient_clip, init_layer_norm, init_linear, layer_norm,
                     linear)

DIM = 384


def _mlp2(params, x):
    """Linear -> ReLU -> Linear (the c1/c2 message MLPs)."""
    return linear(params["2"], jax.nn.relu(linear(params["0"], x)))


def _corr_encoder(params, x):
    """Linear -> ReLU -> Linear -> LayerNorm(1e-3) -> ReLU -> Linear."""
    x = jax.nn.relu(linear(params["0"], x))
    x = linear(params["2"], x)
    x = layer_norm(params["3"], x, eps=1e-3)
    return linear(params["5"], jax.nn.relu(x))


def _gated_residual(params, x):
    """x + sigmoid(gate(x)) * res(x)  (`dpvo/blocks.py:15-29`).

    r5 measured dead end: fusing the gate and res first layers into one
    [D, 2D] matmul (same bytes of x streamed once) ran 0.7 ms SLOWER at
    the 55k tier — XLA pipelines the two [E,384]x[384,384] matmuls better
    than one [E,384]x[384,768]. Same result for the SoftAgg f/g pair."""
    gate = jax.nn.sigmoid(linear(params["gate"]["0"], x))
    res = linear(params["res"]["2"], jax.nn.relu(linear(params["res"]["0"], x)))
    return x + gate * res


def _soft_agg(params, x, seg_ids, num_segments, valid, table=None,
              order=None):
    """SoftAgg (`dpvo/blocks.py:31-48`) with bounded segment ids.

    Uses the one-hot-matmul formulation when the segment count is modest
    (always true for the frame-pair groups) — TPU scatters are an order
    of magnitude slower than the equivalent MXU matmuls. For large
    segment counts (the per-patch groups at big configs): with a
    precomputed segment sort (`order`, the okq_prefix BA table order)
    the reduction runs as banded MXU run-sums
    (`segment_softmax_weighted_sum_runsum`, r5 — replaces the 5-6 ms
    scatter floor); otherwise a [S, cap] member table or the scatter
    formulation."""
    f = linear(params["f"], x)
    g = linear(params["g"], x)
    if order is not None:
        y = segment_softmax_weighted_sum_runsum(f, g, seg_ids, num_segments,
                                                order, valid=valid)
    elif table is not None:
        y = segment_softmax_weighted_sum_table(f, g, table, seg_ids, valid)
    elif num_segments <= 4096:
        y = segment_softmax_weighted_sum_dense(f, g, seg_ids, num_segments,
                                               valid=valid)
    else:
        y = segment_softmax_weighted_sum(f, g, seg_ids, num_segments,
                                         valid=valid)
    return linear(params["h"], y)


def update_forward(params, net, inp, corr, kk_seg, ij_seg, nbr_ix, nbr_jx,
                   valid, num_kk_segments, num_ij_segments, kk_table=None,
                   kk_order=None):
    """One update step over all (padded) edges.

    net:   [E, 384] edge hidden state
    inp:   [E, 384] context features (imap at the edge's patch)
    corr:  [E, 2*49*P*P] correlation features
    kk_seg/ij_seg: bounded segment ids for same-patch / same-frame-pair groups
    nbr_ix/nbr_jx: [E] prev/next edge links (-1 = none), from ops.segment.neighbors
    valid: [E] bool

    Returns (net', delta [E,2], weight [E,2]). Mirrors `Update.forward`
    (`dpvo/net.py:75-93`).
    """
    net = net + inp + _corr_encoder(params["corr"], corr)
    net = layer_norm(params["norm"], net, eps=1e-3)

    mask_ix = ((nbr_ix >= 0) & valid).astype(net.dtype)[:, None]
    mask_jx = ((nbr_jx >= 0) & valid).astype(net.dtype)[:, None]
    # sequential message passing: the c2 gather reads the c1-updated state
    net = net + _mlp2(params["c1"], mask_ix * net[jnp.clip(nbr_ix, 0, None)])
    net = net + _mlp2(params["c2"], mask_jx * net[jnp.clip(nbr_jx, 0, None)])

    net = net + _soft_agg(params["agg_kk"], net, kk_seg, num_kk_segments,
                          valid, table=kk_table, order=kk_order)
    net = net + _soft_agg(params["agg_ij"], net, ij_seg, num_ij_segments, valid)

    net = layer_norm(params["gru"]["0"], net, eps=1e-3)
    net = _gated_residual(params["gru"]["1"], net)
    net = layer_norm(params["gru"]["2"], net, eps=1e-3)
    net = _gated_residual(params["gru"]["3"], net)

    relu_net = jax.nn.relu(net)
    delta = gradient_clip(linear(params["d"]["1"], relu_net))
    weight = jax.nn.sigmoid(gradient_clip(linear(params["w"]["1"], relu_net)))
    return net, delta.astype(jnp.float32), weight.astype(jnp.float32)


def init_update(key, patch_size=3, dtype=jnp.float32):
    ks = jax.random.split(key, 24)
    p = patch_size

    def mlp2(k):
        k1, k2 = jax.random.split(k)
        return {"0": init_linear(k1, DIM, DIM, dtype),
                "2": init_linear(k2, DIM, DIM, dtype)}

    def agg(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {"f": init_linear(k1, DIM, DIM, dtype),
                "g": init_linear(k2, DIM, DIM, dtype),
                "h": init_linear(k3, DIM, DIM, dtype)}

    def gated(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {"gate": {"0": init_linear(k1, DIM, DIM, dtype)},
                "res": {"0": init_linear(k2, DIM, DIM, dtype),
                        "2": init_linear(k3, DIM, DIM, dtype)}}

    return {
        "c1": mlp2(ks[0]),
        "c2": mlp2(ks[1]),
        "norm": init_layer_norm(DIM, dtype),
        "agg_kk": agg(ks[2]),
        "agg_ij": agg(ks[3]),
        "gru": {
            "0": init_layer_norm(DIM, dtype),
            "1": gated(ks[4]),
            "2": init_layer_norm(DIM, dtype),
            "3": gated(ks[5]),
        },
        "corr": {
            "0": init_linear(ks[6], 2 * 49 * p * p, DIM, dtype),
            "2": init_linear(ks[7], DIM, DIM, dtype),
            "3": init_layer_norm(DIM, dtype),
            "5": init_linear(ks[8], DIM, DIM, dtype),
        },
        "d": {"1": init_linear(ks[9], DIM, 2, dtype)},
        "w": {"1": init_linear(ks[10], DIM, 2, dtype)},
    }
