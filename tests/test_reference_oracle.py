"""Parity against the ACTUAL reference torch modules.

Round-1 parity tests (tests/test_models.py) compared against self-built
torch mirrors; if the real `dpvo/net.py` had any key/shape/semantics
surprise, nothing would catch it (VERDICT.md round 1, weak #7). Here the
reference's own `VONet` is imported from /root/reference (read-only, used
purely as a numerical test oracle — none of its code is shipped) with tiny
pure-torch shims for its CUDA/torch_scatter dependencies, and we verify:

  1. a checkpoint saved from the reference VONet — with the published
     dpvo.pth key structure: `module.` prefixes and the `update.lmbda`
     entry the loader must drop (`dpvo/dpvo.py:215-226`) — converts to
     exactly our init_vonet() tree (same keys, same shapes),
  2. our encoders reproduce the reference fnet/inet outputs bit-tight,
  3. our update operator reproduces the reference Update.forward,
     including fastba.neighbors semantics and both SoftAgg groupings.

Skipped when /root/reference is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "dpvo")),
                                reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_net(request):
    """Import the reference dpvo.net with pure-torch shims for its native
    deps; return the constructed VONet (float32, eval mode). The shims are
    purged on module teardown (conftest.reference_shims) so other oracle
    test files import the reference fresh — order-independent."""
    import torch

    from conftest import reference_shims

    if REF not in sys.path:
        sys.path.insert(0, REF)
    ctx = reference_shims()
    ctx.__enter__()
    request.addfinalizer(lambda: ctx.__exit__(None, None, None))

    # ---- torch_scatter shim (scatter_softmax / scatter_sum on dim=1) ----
    ts = types.ModuleType("torch_scatter")

    def scatter_sum(src, index, dim=1, dim_size=None):
        assert dim in (1, -2) or src.dim() == index.dim()
        B, E, D = src.shape
        K = dim_size if dim_size is not None else int(index.max()) + 1
        idx = index.view(1, E, 1).expand(B, E, D)
        return torch.zeros((B, K, D), dtype=src.dtype).scatter_add(
            1, idx, src)

    def scatter_softmax(src, index, dim=1):
        B, E, D = src.shape
        K = int(index.max()) + 1
        idx = index.view(1, E, 1).expand(B, E, D)
        mx = torch.full((B, K, D), -1e30, dtype=src.dtype).scatter_reduce(
            1, idx, src, reduce="amax", include_self=True)
        ex = torch.exp(src - mx.gather(1, idx))
        den = torch.zeros((B, K, D), dtype=src.dtype).scatter_add(1, idx, ex)
        return ex / den.gather(1, idx)

    ts.scatter_sum = scatter_sum
    ts.scatter_softmax = scatter_softmax
    ts.scatter_mean = None
    sys.modules["torch_scatter"] = ts

    # ---- dpvo native-extension shims (CPU re-implementations) -----------
    import dpvo  # noqa: F401  (package __init__ is empty)

    fastba = types.ModuleType("dpvo.fastba")

    def ref_neighbors(kk, jj):
        """CPU replica of `fastba.neighbors` (`dpvo/fastba/ba.cpp:106-151`):
        per patch group (kk), edges sorted stably by target jj; prev/next
        edge index or -1."""
        kk_np = kk.cpu().numpy()
        jj_np = jj.cpu().numpy()
        E = len(kk_np)
        ix = np.full(E, -1, np.int64)
        jx = np.full(E, -1, np.int64)
        for u in np.unique(kk_np):
            idx = np.nonzero(kk_np == u)[0]
            idx = idx[np.argsort(jj_np[idx], kind="stable")]
            for a in range(len(idx)):
                if a > 0:
                    ix[idx[a]] = idx[a - 1]
                if a < len(idx) - 1:
                    jx[idx[a]] = idx[a + 1]
        return torch.from_numpy(ix), torch.from_numpy(jx)

    fastba.neighbors = ref_neighbors
    fastba.BA = None
    fastba.reproject = None
    sys.modules["dpvo.fastba"] = fastba

    altcorr = types.ModuleType("dpvo.altcorr")
    altcorr.corr = None
    altcorr.patchify = None
    sys.modules["dpvo.altcorr"] = altcorr

    lietorch = types.ModuleType("dpvo.lietorch")
    for name in ("LieGroupParameter", "SO3", "RxSO3", "SE3", "Sim3",
                 "cat", "stack"):
        setattr(lietorch, name, type(name, (), {}))
    sys.modules["dpvo.lietorch"] = lietorch

    from dpvo.net import VONet

    torch.manual_seed(0)
    net = VONet(use_viewer=False) if "use_viewer" in \
        VONet.__init__.__code__.co_varnames else VONet()
    net = net.float().eval()
    return net


@pytest.fixture(scope="module")
def converted(ref_net):
    """Published-checkpoint-shaped state dict -> our param tree."""
    import torch

    from wild_video_3d_reconstruction_tpu.models import convert

    sd = {"module." + k: v for k, v in ref_net.state_dict().items()}
    sd["module.update.lmbda"] = torch.zeros(())      # dropped by the loader
    return convert.convert_state_dict(sd)


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        name = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, name))
        else:
            out[name] = np.asarray(v)
    return out


def test_checkpoint_keys_and_shapes_match_init(converted):
    """Every reference key lands somewhere; the converted tree is exactly
    congruent (keys and shapes) with our random init."""
    import jax

    from wild_video_3d_reconstruction_tpu.models.vonet import init_vonet

    ours = _flatten(init_vonet(jax.random.PRNGKey(0)))
    theirs = _flatten(converted)
    assert set(ours) == set(theirs), (
        sorted(set(ours) - set(theirs)), sorted(set(theirs) - set(ours)))
    for k in ours:
        assert ours[k].shape == theirs[k].shape, (
            k, ours[k].shape, theirs[k].shape)


def test_encoder_forward_parity(ref_net, converted):
    """fnet/inet on a real image layout: reference torch vs our JAX."""
    import torch

    import jax.numpy as jnp

    from wild_video_3d_reconstruction_tpu.models.extractor import \
        basic_encoder4

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 96, 3)).astype(np.float32)
    x = 2.0 * (img / 255.0) - 0.5                      # `dpvo/net.py:119`

    xt = torch.from_numpy(x).permute(2, 0, 1)[None, None]   # [B, N, 3, H, W]
    with torch.no_grad():
        fmap_t = ref_net.patchify.fnet(xt).numpy()[0, 0].transpose(1, 2, 0)
        imap_t = ref_net.patchify.inet(xt).numpy()[0, 0].transpose(1, 2, 0)

    xj = jnp.asarray(x)[None]
    fmap_j = np.asarray(basic_encoder4(converted["fnet"], xj, "instance"))[0]
    imap_j = np.asarray(basic_encoder4(converted["inet"], xj, "none"))[0]

    np.testing.assert_allclose(fmap_j, fmap_t, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(imap_j, imap_t, atol=2e-4, rtol=1e-3)


def test_update_forward_parity(ref_net, converted):
    """Full update operator on a realistic edge graph, including neighbor
    message passing and both SoftAgg groups."""
    import torch

    import jax.numpy as jnp

    from wild_video_3d_reconstruction_tpu.models.update import update_forward
    from wild_video_3d_reconstruction_tpu.ops.segment import neighbors

    rng = np.random.default_rng(1)
    M, n_frames, lifetime = 8, 6, 3
    ii, jj, kk = [], [], []
    for src in range(n_frames):
        for m in range(M):
            for tgt in range(max(0, src - lifetime),
                             min(n_frames, src + lifetime)):
                ii.append(src), jj.append(tgt), kk.append(src * M + m)
    ii = np.asarray(ii, np.int64)
    jj = np.asarray(jj, np.int64)
    kk = np.asarray(kk, np.int64)
    E = len(ii)

    net0 = rng.normal(size=(E, 384)).astype(np.float32)
    ctx = rng.normal(size=(E, 384)).astype(np.float32)
    corr = rng.normal(size=(E, 882)).astype(np.float32)

    with torch.no_grad():
        net_t, (d_t, w_t, _) = ref_net.update(
            torch.from_numpy(net0)[None], torch.from_numpy(ctx)[None],
            torch.from_numpy(corr)[None], None,
            torch.from_numpy(ii), torch.from_numpy(jj),
            torch.from_numpy(kk))
    net_t = net_t.numpy()[0]
    d_t = d_t.numpy()[0]
    w_t = w_t.numpy()[0]

    # our bounded segment ids: any relabeling that induces the same
    # partition as torch.unique is equivalent
    kk_seg = jnp.asarray(kk, jnp.int32)
    ij_seg = jnp.asarray(ii * (n_frames + 1) + jj, jnp.int32)
    valid = jnp.ones((E,), bool)
    nbr_ix, nbr_jx = neighbors(jnp.asarray(kk, jnp.int32),
                               jnp.asarray(jj, jnp.int32), valid=valid)
    net_j, d_j, w_j = update_forward(
        converted["update"], jnp.asarray(net0), jnp.asarray(ctx),
        jnp.asarray(corr), kk_seg, ij_seg, nbr_ix, nbr_jx, valid,
        n_frames * M + 1, (n_frames + 1) ** 2 + 1)

    np.testing.assert_allclose(np.asarray(net_j), net_t, atol=5e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d_j), d_t, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(w_j), w_t, atol=5e-4, rtol=1e-3)


def test_neighbors_matches_reference_semantics(ref_net):
    """Our sort-based neighbors vs the CPU replica of ba.cpp on random
    graphs (including patches with a single edge)."""
    import torch

    import jax.numpy as jnp

    from wild_video_3d_reconstruction_tpu.ops.segment import neighbors

    fastba = sys.modules["dpvo.fastba"]
    rng = np.random.default_rng(2)
    for trial in range(5):
        E = int(rng.integers(5, 200))
        kk = rng.integers(0, 40, E).astype(np.int64)
        jj = rng.integers(0, 12, E).astype(np.int64)
        ix_ref, jx_ref = fastba.neighbors(torch.from_numpy(kk),
                                          torch.from_numpy(jj))
        ix, jx = neighbors(jnp.asarray(kk, jnp.int32),
                           jnp.asarray(jj, jnp.int32))
        np.testing.assert_array_equal(np.asarray(ix), ix_ref.numpy())
        np.testing.assert_array_equal(np.asarray(jx), jx_ref.numpy())
