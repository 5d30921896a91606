"""hloc-compatible NetVLAD (VGG16 + NetVLAD layer + whitening) in JAX.

The reference's loop retrieval uses hloc's NetVLAD extractor
(`dpvo/netvlad_retrieval.py:24-61`): VGG16 features to conv5_3/relu, a
64-cluster NetVLAD pooling layer, and a 32768->4096 whitening projection,
L2-normalized. This module reimplements that forward in JAX and converts
the hloc torch state dict (`backbone.{i}.*`, `netvlad.score_proj.*`,
`netvlad.centers`, `whiten.*`) so the published Pitts30K checkpoint drops
in. The torch replica used by the parity test
(`tests/test_netvlad_hloc.py`) mirrors hloc's module naming exactly.

Preprocessing follows the MatConvNet convention the checkpoint was
trained with: RGB in [0, 255] minus the channel means
(123.68, 116.779, 103.939).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# VGG16 `features` layout (torchvision indices): conv indices + pools, cut
# before the final max-pool (hloc keeps through relu5_3)
VGG16_CONVS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
VGG16_POOLS = {4, 9, 16, 23}
RGB_MEAN = (123.68, 116.779, 103.939)
K = 64
CDIM = 512
WHITEN_DIM = 4096


def init_params(key, whiten=True):
    """Random parameters with the hloc shapes (for tests / cold start)."""
    params = {}
    cin = 3
    widths = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    keys = jax.random.split(key, len(VGG16_CONVS) + 3)
    for i, (idx, cout) in enumerate(zip(VGG16_CONVS, widths)):
        params[f"conv{idx}"] = {
            "w": jax.random.normal(keys[i], (3, 3, cin, cout)) *
            (2.0 / (9 * cin)) ** 0.5,
            "b": jnp.zeros((cout,)),
        }
        cin = cout
    params["score_proj"] = {
        "w": jax.random.normal(keys[-3], (CDIM, K)) * 0.05}
    params["centers"] = jax.random.normal(keys[-2], (CDIM, K))
    if whiten:
        params["whiten"] = {
            "w": jax.random.normal(keys[-1], (K * CDIM, WHITEN_DIM)) * 0.01,
            "b": jnp.zeros((WHITEN_DIM,)),
        }
    return params


def vgg16_features(params, x):
    """x: [H, W, 3] float RGB (already mean-subtracted). -> [h, w, 512]."""
    x = x[None]
    for idx in range(max(VGG16_CONVS) + 2):
        if idx in VGG16_CONVS:
            p = params[f"conv{idx}"]
            x = jax.lax.conv_general_dilated(
                x, p["w"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]
            x = jax.nn.relu(x)      # every conv is followed by ReLU
        elif idx in VGG16_POOLS:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
    return x[0]


def netvlad_pool(params, feats):
    """feats: [h, w, C] -> [K*C] (intra-normalized, L2)."""
    x = feats.reshape(-1, CDIM)                       # [N, C]
    scores = jax.nn.softmax(x @ params["score_proj"]["w"], axis=-1)  # [N, K]
    # sum_n a[n,k] (x[n] - c[:,k]) without the [N, K, C] intermediate
    centers = params["centers"]                       # [C, K]
    vlad = (scores.T @ x).T - centers * scores.sum(0)[None, :]  # [C, K]
    vlad = vlad / jnp.maximum(
        jnp.linalg.norm(vlad, axis=0, keepdims=True), 1e-12)
    # hloc flattens [C, K] with K-major ordering (desc.view(b, -1) on
    # [B, C, K]) -> row-major over (C, K)
    v = vlad.reshape(-1)
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)


def global_descriptor(params, image_rgb):
    """image_rgb: [H, W, 3] float 0..255 RGB -> [4096] (or [K*C])."""
    x = image_rgb - jnp.asarray(RGB_MEAN)
    feats = vgg16_features(params, x)
    v = netvlad_pool(params, feats)
    if "whiten" in params:
        v = v @ params["whiten"]["w"] + params["whiten"]["b"]
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
    return v


def convert_hloc_state_dict(sd):
    """Map hloc's NetVLAD torch state dict onto the JAX parameter tree.

    Keys: backbone.{i}.weight/bias (OIHW), netvlad.score_proj.weight
    ([K, C, 1] conv1d), netvlad.centers ([C, K]), whiten.weight/bias
    ([4096, K*C] linear)."""
    import torch

    def t2j(t):
        return jnp.asarray(np.asarray(t.detach().cpu(), np.float32))

    params = {}
    for idx in VGG16_CONVS:
        params[f"conv{idx}"] = {
            "w": jnp.transpose(t2j(sd[f"backbone.{idx}.weight"]),
                               (2, 3, 1, 0)),
            "b": t2j(sd[f"backbone.{idx}.bias"]),
        }
    params["score_proj"] = {
        "w": jnp.transpose(t2j(sd["netvlad.score_proj.weight"])[..., 0],
                           (1, 0))}
    params["centers"] = t2j(sd["netvlad.centers"])
    if "whiten.weight" in sd:
        params["whiten"] = {
            "w": jnp.transpose(t2j(sd["whiten.weight"]), (1, 0)),
            "b": t2j(sd["whiten.bias"]),
        }
    return params


class HlocNetVLAD:
    """Drop-in global-descriptor extractor (`VLADDescriptor` protocol).

    Construct from a checkpoint path (torch state dict of hloc's NetVLAD)
    or random params. `extract` takes the SLAM's BGR uint8 frame.
    """

    def __init__(self, checkpoint=None, whiten=True, seed=0):
        if checkpoint is not None:
            import torch

            sd = torch.load(checkpoint, map_location="cpu")
            sd = sd.get("state_dict", sd)
            self.params = convert_hloc_state_dict(sd)
        else:
            self.params = init_params(jax.random.PRNGKey(seed), whiten)
        self._extract = jax.jit(lambda img: global_descriptor(
            self.params, img[..., ::-1].astype(jnp.float32)))

    @property
    def dim(self):
        return WHITEN_DIM if "whiten" in self.params else K * CDIM

    def extract_image(self, image_bgr):
        """image_bgr: [H, W, 3] uint8 -> np [dim] descriptor."""
        return np.asarray(self._extract(jnp.asarray(image_bgr)))
