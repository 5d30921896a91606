"""RAFT-style residual CNN encoders (stride-4 and stride-8).

Functional NHWC re-implementation of the reference's `BasicEncoder4` /
`BasicEncoder` (`dpvo/extractor.py:117-264`): 7x7/2 stem + residual layers +
1x1 output conv, with selectable normalization ('instance' for the matching
feature net, 'none' for the context net — `dpvo/net.py:100-101`). Weight
layouts are torch-convertible (see `models/convert.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import conv2d, init_conv, instance_norm

DIM = 32


def _norm(x, norm_fn):
    if norm_fn == "instance":
        return instance_norm(x)
    if norm_fn == "none":
        return x
    raise NotImplementedError(f"norm_fn={norm_fn} (reference inference paths "
                              "only use instance/none)")


def _residual_block(params, x, norm_fn, stride):
    y = jax.nn.relu(_norm(conv2d(params["conv1"], x, stride=stride), norm_fn))
    y = jax.nn.relu(_norm(conv2d(params["conv2"], y), norm_fn))
    if stride != 1:
        x = _norm(conv2d(params["downsample"], x, stride=stride), norm_fn)
    return jax.nn.relu(x + y)


def init_residual_block(key, cin, cout, stride, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": init_conv(k1, 3, 3, cin, cout, dtype=dtype),
        "conv2": init_conv(k2, 3, 3, cout, cout, dtype=dtype),
    }
    if stride != 1:
        p["downsample"] = init_conv(k3, 1, 1, cin, cout, dtype=dtype)
    return p


def basic_encoder4(params, x, norm_fn):
    """Stride-4 encoder. x: [N, H, W, 3] -> [N, H/4, W/4, output_dim]."""
    x = jax.nn.relu(_norm(conv2d(params["conv1"], x, stride=2), norm_fn))
    x = _residual_block(params["layer1"]["0"], x, norm_fn, stride=1)
    x = _residual_block(params["layer1"]["1"], x, norm_fn, stride=1)
    x = _residual_block(params["layer2"]["0"], x, norm_fn, stride=2)
    x = _residual_block(params["layer2"]["1"], x, norm_fn, stride=1)
    return conv2d(params["conv2"], x)


def init_basic_encoder4(key, output_dim, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    return {
        "conv1": init_conv(ks[0], 7, 7, 3, DIM, dtype=dtype),
        "layer1": {
            "0": init_residual_block(ks[1], DIM, DIM, 1, dtype),
            "1": init_residual_block(ks[2], DIM, DIM, 1, dtype),
        },
        "layer2": {
            "0": init_residual_block(ks[3], DIM, 2 * DIM, 2, dtype),
            "1": init_residual_block(ks[4], 2 * DIM, 2 * DIM, 1, dtype),
        },
        "conv2": init_conv(ks[5], 1, 1, 2 * DIM, output_dim, dtype=dtype),
    }


def basic_encoder8(params, x, norm_fn):
    """Stride-8 encoder (the reference's BasicEncoder, kept for DROID-style
    dense paths). x: [N, H, W, 3] -> [N, H/8, W/8, output_dim]."""
    x = jax.nn.relu(_norm(conv2d(params["conv1"], x, stride=2), norm_fn))
    x = _residual_block(params["layer1"]["0"], x, norm_fn, stride=1)
    x = _residual_block(params["layer1"]["1"], x, norm_fn, stride=1)
    x = _residual_block(params["layer2"]["0"], x, norm_fn, stride=2)
    x = _residual_block(params["layer2"]["1"], x, norm_fn, stride=1)
    x = _residual_block(params["layer3"]["0"], x, norm_fn, stride=2)
    x = _residual_block(params["layer3"]["1"], x, norm_fn, stride=1)
    return conv2d(params["conv2"], x)


def init_basic_encoder8(key, output_dim, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    return {
        "conv1": init_conv(ks[0], 7, 7, 3, DIM, dtype=dtype),
        "layer1": {
            "0": init_residual_block(ks[1], DIM, DIM, 1, dtype),
            "1": init_residual_block(ks[2], DIM, DIM, 1, dtype),
        },
        "layer2": {
            "0": init_residual_block(ks[3], DIM, 2 * DIM, 2, dtype),
            "1": init_residual_block(ks[4], 2 * DIM, 2 * DIM, 1, dtype),
        },
        "layer3": {
            "0": init_residual_block(ks[5], 2 * DIM, 4 * DIM, 2, dtype),
            "1": init_residual_block(ks[6], 4 * DIM, 4 * DIM, 1, dtype),
        },
        "conv2": init_conv(ks[7], 1, 1, 4 * DIM, output_dim, dtype=dtype),
    }
