"""Minimal functional NN layers (explicit param pytrees, no framework).

The VONet is small (~10M params) and its exact numerics must reproduce the
reference torch modules to reuse published `dpvo.pth` weights, so we keep
full control with hand-rolled layers instead of flax/haiku. Channel-last
(NHWC) everywhere — the TPU-native layout (channels on VMEM lanes, convs hit
the MXU directly).

Param dicts use torch-compatible leaf names ("weight", "bias") with weights
pre-transposed at conversion time:
  conv:   weight [kh, kw, cin, cout]  (torch OIHW -> HWIO)
  linear: weight [in, out]            (torch [out, in] transposed)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv2d(params, x, stride=1, padding=None):
    """x: [N, H, W, Cin] -> [N, H', W', Cout].

    Padding defaults to symmetric kernel//2 on each side (torch semantics —
    XLA's "SAME" pads asymmetrically under stride>1 and would not reproduce
    checkpoint numerics).
    """
    w = params["weight"]
    if padding is None:
        ph, pw = (w.shape[0] - 1) // 2, (w.shape[1] - 1) // 2
        padding = ((ph, ph), (pw, pw))
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if "bias" in params:
        out = out + params["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def linear(params, x):
    out = jnp.dot(x, params["weight"].astype(x.dtype),
                  preferred_element_type=jnp.float32)
    if "bias" in params:
        out = out + params["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def instance_norm(x, eps=1e-5):
    """InstanceNorm2d(affine=False, track_running_stats=False) on NHWC.

    Normalizes each (sample, channel) over spatial dims, biased variance —
    matching torch defaults used by BasicEncoder4(norm_fn='instance')
    (`dpvo/extractor.py:29`). Statistics in fp32.
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def layer_norm(params, x, eps):
    """LayerNorm over the trailing feature dim, fp32 statistics."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["weight"].astype(jnp.float32) + params["bias"].astype(
        jnp.float32)
    return y.astype(x.dtype)


@jax.custom_vjp
def gradient_clip(x):
    """Identity with clamped backward: grad in [-0.01, 0.01], NaN -> 0.

    Port of the reference GradClip autograd function
    (`dpvo/blocks.py:74-89`), used on the flow/weight heads.
    """
    return x


def _gc_fwd(x):
    return x, None


def _gc_bwd(_, g):
    g = jnp.where(jnp.isnan(g), 0.0, g)
    return (jnp.clip(g, -0.01, 0.01),)


gradient_clip.defvjp(_gc_fwd, _gc_bwd)


@jax.custom_vjp
def gradient_zero(x):
    """Identity; backward zeroes NaNs and grads with |g| > 0.1
    (`dpvo/blocks.py:91-107`)."""
    return x


def _gz_fwd(x):
    return x, None


def _gz_bwd(_, g):
    g = jnp.where(jnp.isnan(g), 0.0, g)
    return (jnp.where(jnp.abs(g) > 0.1, 0.0, g),)


gradient_zero.defvjp(_gz_fwd, _gz_bwd)


# ---------------------------------------------------------------------------
# initializers (torch-compatible defaults, for training from scratch)
# ---------------------------------------------------------------------------

def init_conv(key, kh, kw, cin, cout, bias=True, dtype=jnp.float32):
    """Kaiming-normal fan_out (the reference's encoder init,
    `dpvo/extractor.py:233-240`)."""
    fan_out = kh * kw * cout
    std = (2.0 / fan_out) ** 0.5
    p = {"weight": std * jax.random.normal(key, (kh, kw, cin, cout), dtype)}
    if bias:
        p["bias"] = jnp.zeros((cout,), dtype)
    return p


def init_linear(key, cin, cout, dtype=jnp.float32):
    """torch nn.Linear default: U(-1/sqrt(cin), 1/sqrt(cin))."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / (cin ** 0.5)
    return {
        "weight": jax.random.uniform(k1, (cin, cout), dtype, -bound, bound),
        "bias": jax.random.uniform(k2, (cout,), dtype, -bound, bound),
    }


def init_layer_norm(dim, dtype=jnp.float32):
    return {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}
