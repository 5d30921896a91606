"""Weight-compatibility parity tests: functional JAX model vs torch oracles.

Torch mirror modules are built with plain torch.nn (torch CPU is available in
the image) using the reference's architecture *shapes*; their state dicts are
converted through `models.convert` and the outputs compared. This validates
the converter's layout transforms and the exact numerics (instance-norm eps,
LayerNorm eps, gating order) needed to reuse published dpvo.pth weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from wild_video_3d_reconstruction_tpu.models import convert, extractor, update
from wild_video_3d_reconstruction_tpu.ops import segment

torch.manual_seed(0)


# ----------------------------- torch mirrors ------------------------------

class TResBlock(nn.Module):
    def __init__(self, cin, cout, norm, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1, stride=stride)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        mk = (lambda: nn.InstanceNorm2d(cout)) if norm == "instance" \
            else (lambda: nn.Sequential())
        self.norm1, self.norm2 = mk(), mk()
        self.downsample = None
        if stride != 1:
            self.norm3 = mk()
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride), self.norm3)

    def forward(self, x):
        y = torch.relu(self.norm1(self.conv1(x)))
        y = torch.relu(self.norm2(self.conv2(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return torch.relu(x + y)


class TEncoder4(nn.Module):
    def __init__(self, out_dim, norm):
        super().__init__()
        self.norm_fn = norm
        self.conv1 = nn.Conv2d(3, 32, 7, stride=2, padding=3)
        self.norm1 = nn.InstanceNorm2d(32) if norm == "instance" \
            else nn.Sequential()
        self.layer1 = nn.Sequential(TResBlock(32, 32, norm),
                                    TResBlock(32, 32, norm))
        self.layer2 = nn.Sequential(TResBlock(32, 64, norm, stride=2),
                                    TResBlock(64, 64, norm))
        self.conv2 = nn.Conv2d(64, out_dim, 1)

    def forward(self, x):
        x = torch.relu(self.norm1(self.conv1(x)))
        x = self.layer2(self.layer1(x))
        return self.conv2(x)


def scatter_softmax_sum(f, g, seg):
    out = torch.zeros_like(f)
    for s in seg.unique():
        m = seg == s
        w = torch.softmax(g[m], dim=0)
        out[m] = (f[m] * w).sum(0, keepdim=True)
    return out


class TSoftAgg(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.f = nn.Linear(dim, dim)
        self.g = nn.Linear(dim, dim)
        self.h = nn.Linear(dim, dim)

    def forward(self, x, ix):
        return self.h(scatter_softmax_sum(self.f(x), self.g(x), ix))


class TGated(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gate = nn.Sequential(nn.Linear(dim, dim), nn.Sigmoid())
        self.res = nn.Sequential(nn.Linear(dim, dim), nn.ReLU(),
                                 nn.Linear(dim, dim))

    def forward(self, x):
        return x + self.gate(x) * self.res(x)


class TUpdate(nn.Module):
    def __init__(self, dim=384, p=3):
        super().__init__()
        self.c1 = nn.Sequential(nn.Linear(dim, dim), nn.ReLU(),
                                nn.Linear(dim, dim))
        self.c2 = nn.Sequential(nn.Linear(dim, dim), nn.ReLU(),
                                nn.Linear(dim, dim))
        self.norm = nn.LayerNorm(dim, eps=1e-3)
        self.agg_kk = TSoftAgg(dim)
        self.agg_ij = TSoftAgg(dim)
        self.gru = nn.Sequential(nn.LayerNorm(dim, eps=1e-3), TGated(dim),
                                 nn.LayerNorm(dim, eps=1e-3), TGated(dim))
        self.corr = nn.Sequential(nn.Linear(2 * 49 * p * p, dim), nn.ReLU(),
                                  nn.Linear(dim, dim),
                                  nn.LayerNorm(dim, eps=1e-3), nn.ReLU(),
                                  nn.Linear(dim, dim))
        self.d = nn.Sequential(nn.ReLU(), nn.Linear(dim, 2))
        self.w = nn.Sequential(nn.ReLU(), nn.Linear(dim, 2), nn.Sigmoid())

    def forward(self, net, inp, corr, nbr_ix, nbr_jx, kk, ij):
        net = net + inp + self.corr(corr)
        net = self.norm(net)
        mi = (nbr_ix >= 0).float().unsqueeze(-1)
        mj = (nbr_jx >= 0).float().unsqueeze(-1)
        net = net + self.c1(mi * net[nbr_ix.clamp(min=0)])
        net = net + self.c2(mj * net[nbr_jx.clamp(min=0)])
        net = net + self.agg_kk(net, kk)
        net = net + self.agg_ij(net, ij)
        net = self.gru(net)
        return net, self.d(net), self.w(net)


class Wrapper(nn.Module):
    """Gives state-dict keys the reference checkpoint naming."""

    def __init__(self, fnet, inet, upd):
        super().__init__()
        self.patchify = nn.Module()
        self.patchify.fnet = fnet
        self.patchify.inet = inet
        self.update = upd


# --------------------------------- tests ----------------------------------

@pytest.mark.parametrize("norm", ["instance", "none"])
def test_encoder_parity(norm):
    tenc = TEncoder4(16, norm).eval()
    wrapper = Wrapper(tenc, TEncoder4(16, norm), TUpdate())
    params = convert.convert_state_dict(wrapper.state_dict())

    x = np.random.default_rng(0).normal(size=(1, 3, 32, 48)).astype(np.float32)
    with torch.no_grad():
        ref = tenc(torch.from_numpy(x)).numpy()

    out = extractor.basic_encoder4(params["fnet"],
                                   jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                                   norm)
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_update_parity():
    tupd = TUpdate().eval()
    wrapper = Wrapper(TEncoder4(8, "instance"), TEncoder4(8, "none"), tupd)
    params = convert.convert_state_dict(wrapper.state_dict())["update"]

    rng = np.random.default_rng(1)
    E, D = 40, 384
    net = rng.normal(size=(E, D)).astype(np.float32)
    inp = rng.normal(size=(E, D)).astype(np.float32)
    corr = rng.normal(size=(E, 2 * 49 * 9)).astype(np.float32) * 0.1
    kk = rng.integers(0, 12, size=E)
    jj = rng.integers(0, 6, size=E)
    ii = kk // 2
    ij = ii * 12345 + jj

    # neighbors + bounded segment ids shared by both sides
    nbr_ix, nbr_jx = segment.neighbors(jnp.asarray(kk), jnp.asarray(jj))
    nbr_ix, nbr_jx = np.asarray(nbr_ix), np.asarray(nbr_jx)

    with torch.no_grad():
        tnet, tdelta, tweight = tupd(
            torch.from_numpy(net), torch.from_numpy(inp),
            torch.from_numpy(corr), torch.from_numpy(nbr_ix),
            torch.from_numpy(nbr_jx), torch.from_numpy(kk),
            torch.from_numpy(ij))

    # bounded ids: any injective relabeling of the group keys works
    _, kk_seg = np.unique(kk, return_inverse=True)
    _, ij_seg = np.unique(ij, return_inverse=True)
    valid = jnp.ones((E,), dtype=bool)
    jnet, jdelta, jweight = update.update_forward(
        params, jnp.asarray(net), jnp.asarray(inp), jnp.asarray(corr),
        jnp.asarray(kk_seg), jnp.asarray(ij_seg), jnp.asarray(nbr_ix),
        jnp.asarray(nbr_jx), valid, 16, 64)

    np.testing.assert_allclose(np.asarray(jnet), tnet.numpy(),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jdelta), tdelta.numpy(),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jweight), tweight.numpy(),
                               atol=1e-4, rtol=1e-3)


def test_convert_roundtrip():
    tupd = TUpdate().eval()
    wrapper = Wrapper(TEncoder4(8, "instance"), TEncoder4(8, "none"), tupd)
    sd = {f"module.{k}": v for k, v in wrapper.state_dict().items()}
    sd["module.update.lmbda"] = torch.zeros(1)  # must be dropped
    params = convert.convert_state_dict(sd)
    assert "lmbda" not in params.get("update", {})
    back = convert.params_to_state_dict(params)
    orig = {k: v.numpy() for k, v in wrapper.state_dict().items()}
    for k, v in orig.items():
        k2 = k.replace("downsample.0.", "downsample.")
        k2 = k2.replace("patchify.fnet.", "fnet.").replace(
            "patchify.inet.", "inet.")
        np.testing.assert_allclose(back[k2], v, atol=0,
                                   err_msg=k)


def test_keypoint_patch_selection():
    """Shi-Tomasi keypoint policy (SuperPoint-equivalent of
    `dpvo/net.py:112-117`): centers concentrate on corner structures."""
    import numpy as np
    from wild_video_3d_reconstruction_tpu.models import vonet

    img = np.zeros((96, 128, 3), np.uint8)
    corners_full = [(24, 32), (24, 96), (72, 32), (72, 96)]
    for (cy, cx) in corners_full:
        img[cy:cy + 12, cx:cx + 12] = 255     # bright squares -> 4 corners each

    resp = vonet.keypoint_response_map(jnp.asarray(img))
    assert resp.shape == ((96 - 1) // 4, (128 - 1) // 4)

    M = 8
    xy = np.asarray(vonet.select_patches(
        jax.random.PRNGKey(0), M, resp.shape[0], resp.shape[1],
        keypoint_map=resp))
    assert xy.shape == (M, 2)
    # every selected center lies within a few 1/4-res pixels of a square
    sq = np.array([(c[1] / 4, c[0] / 4) for c in corners_full])  # (x, y)
    for x, y in xy:
        d = np.sqrt(((sq - [x, y]) ** 2).sum(1)).min()
        assert d < 5.0, (x, y, d)
