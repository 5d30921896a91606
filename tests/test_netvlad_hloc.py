"""Parity of the JAX hloc-NetVLAD against a torch replica with hloc's
exact module naming (backbone Sequential indices, netvlad.score_proj,
netvlad.centers, whiten) — the converter consumes the replica's state
dict just as it would the published Pitts30K checkpoint."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from wild_video_3d_reconstruction_tpu.loop import netvlad_hloc as nvh


class NetVLADLayer(nn.Module):
    def __init__(self, input_dim=512, K=64, score_bias=False,
                 intranorm=True):
        super().__init__()
        self.score_proj = nn.Conv1d(input_dim, K, kernel_size=1,
                                    bias=score_bias)
        centers = nn.Parameter(torch.empty([input_dim, K]))
        nn.init.xavier_uniform_(centers)
        self.register_parameter("centers", centers)
        self.intranorm = intranorm

    def forward(self, x):                       # x: [B, C, N]
        b = x.size(0)
        scores = self.score_proj(x)
        scores = F.softmax(scores, dim=1)
        diff = x.unsqueeze(2) - self.centers.unsqueeze(0).unsqueeze(-1)
        desc = (scores.unsqueeze(1) * diff).sum(dim=-1)
        if self.intranorm:
            desc = F.normalize(desc, dim=1)
        desc = desc.view(b, -1)
        return F.normalize(desc, dim=1)


class TorchNetVLAD(nn.Module):
    """hloc NetVLAD with a thin VGG16-features replica (small widths for
    test speed would change key names, so full widths, random init)."""

    def __init__(self, whiten=True):
        super().__init__()
        widths = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                  512, 512, 512, "M", 512, 512, 512]
        layers, cin = [], 3
        for w in widths:
            if w == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.Conv2d(cin, w, 3, padding=1))
                layers.append(nn.ReLU(inplace=True))
                cin = w
        self.backbone = nn.Sequential(*layers)
        self.netvlad = NetVLADLayer()
        if whiten:
            self.whiten = nn.Linear(64 * 512, 4096)

    def forward(self, image):                   # [B, 3, H, W] RGB 0..255
        mean = image.new_tensor(nvh.RGB_MEAN).view(1, 3, 1, 1)
        x = self.backbone(image - mean)
        b, c, _, _ = x.shape
        desc = self.netvlad(x.view(b, c, -1))
        if hasattr(self, "whiten"):
            desc = self.whiten(desc)
            desc = F.normalize(desc, dim=1)
        return desc


@pytest.mark.slow
def test_hloc_netvlad_parity():
    torch.manual_seed(0)
    model = TorchNetVLAD().eval()
    params = nvh.convert_hloc_state_dict(model.state_dict())

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, size=(64, 96, 3)).astype(np.float32)

    with torch.no_grad():
        ref = model(torch.from_numpy(img).permute(2, 0, 1)[None])[0].numpy()
    out = np.asarray(nvh.global_descriptor(params, jnp.asarray(img)))

    assert out.shape == ref.shape == (4096,)
    cos = float(np.dot(out, ref))
    assert cos > 0.999, cos
    np.testing.assert_allclose(out, ref, atol=5e-3)


def test_hloc_netvlad_extractor_protocol():
    ex = nvh.HlocNetVLAD(checkpoint=None)      # random params
    d = ex.extract_image(np.zeros((64, 96, 3), np.uint8))
    assert d.shape == (ex.dim,)
    assert abs(np.linalg.norm(d) - 1.0) < 1e-4


def test_converter_consumes_manifest_exact_state_dict():
    """Structural pin against the published Pitts30K checkpoint layout:
    a state dict with EXACTLY the manifest's keys/shapes converts, the
    converter consumes every key, and the resulting tree drives the JAX
    forward (VERDICT r2 #9 — the checkpoint itself cannot be
    materialized in-image)."""
    import json
    import os

    import torch

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "fixtures",
                           "hloc_netvlad_manifest.json")) as f:
        manifest = json.load(f)["keys"]

    g = torch.Generator().manual_seed(0)
    sd = {k: torch.randn(*shape, generator=g) * 0.02
          for k, shape in manifest.items()}
    params = nvh.convert_hloc_state_dict(sd)

    # every manifest key must land in the tree (no silent drops)
    consumed = set()
    for idx in nvh.VGG16_CONVS:
        cout, cin = manifest[f"backbone.{idx}.weight"][:2]
        assert params[f"conv{idx}"]["w"].shape == (3, 3, cin, cout)
        consumed |= {f"backbone.{idx}.weight", f"backbone.{idx}.bias"}
    assert params["score_proj"]["w"].shape == (512, 64)
    assert params["centers"].shape == (512, 64)
    assert params["whiten"]["w"].shape == (32768, 4096)
    consumed |= {"netvlad.score_proj.weight", "netvlad.centers",
                 "whiten.weight", "whiten.bias"}
    assert consumed == set(manifest), set(manifest) - consumed

    # the converted tree must run the full descriptor forward
    import numpy as np

    import jax.numpy as jnp
    img = np.random.default_rng(0).integers(
        0, 255, (64, 96, 3)).astype(np.float32)
    v = np.asarray(nvh.global_descriptor(params, jnp.asarray(img)))
    assert v.shape == (4096,)
    assert np.isfinite(v).all()
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4
