"""Bundle-adjustment parity against the reference's own Python BA.

`dpvo/ba.py:86-188` is the reference's slow-but-trusted BA kept as a
drop-in for the CUDA kernel (`dpvo/dpvo.py:737-745` comment). Running it
on CPU (with pure-torch shims for torch_scatter and lietorch.SE3) against
our `ba.gauss_newton.bundle_adjust` on identical inputs validates the
whole Gauss-Newton chain — residuals, analytic Jacobians, Schur
complement, damping, retractions — far more strongly than synthetic
self-consistency. Inputs are chosen away from the paths where the two
implementations intentionally differ (training-BA depth clamp [1e-3, 10]
vs inference clamp reset>20/floor 1e-4; robust-mask borderline cases).
"""

import os
import sys
import types

import numpy as np
import pytest
import torch

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "dpvo")),
                                reason="reference repo not mounted")


# ---------------------------------------------------------------------------
# pure-torch SE3 shim with the lietorch surface ba.py/projective_ops use
# ---------------------------------------------------------------------------

def _qmul(q1, q2):
    x1, y1, z1, w1 = q1.unbind(-1)
    x2, y2, z2, w2 = q2.unbind(-1)
    return torch.stack([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2], -1)


def _qrot(q, v):
    qv = q[..., :3]
    w = q[..., 3:]
    t = 2 * torch.cross(qv, v, dim=-1)
    return v + w * t + torch.cross(qv, t, dim=-1)


def _qinv(q):
    return torch.cat([-q[..., :3], q[..., 3:]], -1)


def _rotmat(q):
    x, y, z, w = q.unbind(-1)
    return torch.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], -1).reshape(*q.shape[:-1], 3, 3)


def _skew(v):
    x, y, z = v.unbind(-1)
    o = torch.zeros_like(x)
    return torch.stack([o, -z, y, z, o, -x, -y, x, o],
                       -1).reshape(*v.shape[:-1], 3, 3)


def _se3_exp(xi):
    rho, phi = xi[..., :3], xi[..., 3:]
    angle = phi.norm(dim=-1, keepdim=True).clamp(min=1e-12)
    half = 0.5 * angle
    q = torch.cat([phi / angle * torch.sin(half), torch.cos(half)], -1)
    K = _skew(phi)
    th = angle[..., None]
    I = torch.eye(3, dtype=xi.dtype).expand(*xi.shape[:-1], 3, 3)
    V = (I + (1 - torch.cos(th)) / th ** 2 * K
         + (th - torch.sin(th)) / th ** 3 * (K @ K))
    t = (V @ rho[..., None])[..., 0]
    return torch.cat([t, q], -1)


class SE3Shim:
    def __init__(self, data):
        self.data = data

    def __getitem__(self, idx):
        return SE3Shim(self.data[idx])

    def __setitem__(self, idx, value):
        # lietorch SE3 supports raw-data item assignment (used by the
        # translation-only branch of `projective_ops.transform`)
        self.data[idx] = value

    def inv(self):
        qi = _qinv(self.data[..., 3:])
        t = -_qrot(qi, self.data[..., :3])
        return SE3Shim(torch.cat([t, qi], -1))

    def __mul__(self, other):
        if isinstance(other, SE3Shim):
            t1, q1 = self.data[..., :3], self.data[..., 3:]
            t2, q2 = other.data[..., :3], other.data[..., 3:]
            return SE3Shim(torch.cat(
                [t1 + _qrot(q1, t2), _qmul(q1, q2)], -1))
        # act on homogeneous 4-vectors [..., 4]
        X, w = other[..., :3], other[..., 3:]
        t, q = self.data[..., :3], self.data[..., 3:]
        return torch.cat([_qrot(q, X) + w * t, w], -1)

    def adj_matrix(self):
        R = _rotmat(self.data[..., 3:])
        tR = _skew(self.data[..., :3]) @ R
        top = torch.cat([R, tR], -1)
        bot = torch.cat([torch.zeros_like(R), R], -1)
        return torch.cat([top, bot], -2)                 # [..., 6, 6]

    def adjT(self, J):
        # lietorch adjT: Ad(G)^T applied to each trailing 6-vector of J,
        # i.e. row-vector times Ad(G), broadcast over J's extra dims
        A = self.adj_matrix()
        return (J.unsqueeze(-2) @ A).squeeze(-2)

    def matrix(self):
        R = _rotmat(self.data[..., 3:])
        t = self.data[..., :3, None]
        top = torch.cat([R, t], -1)
        bottom = torch.zeros_like(top[..., :1, :])
        bottom[..., 0, 3] = 1.0
        return torch.cat([top, bottom], -2)

    def retr(self, dx):
        return SE3Shim(torch.cat([
            (SE3Shim(_se3_exp(dx)) * SE3Shim(self.data)).data], -1))

    @property
    def shape(self):
        return self.data.shape[:-1]

    @property
    def device(self):
        return self.data.device

    # --- additions used by the full VONet.forward (test_forward_parity) ---
    def detach(self):
        return SE3Shim(self.data.detach())

    @classmethod
    def IdentityLike(cls, other):
        d = torch.zeros_like(other.data)
        d[..., 6] = 1.0
        return cls(d)


@pytest.fixture(scope="module")
def ref_ba(request):
    """Import dpvo.ba with torch_scatter + lietorch shims. Shims are purged
    on module teardown (conftest.reference_shims) so the other oracle test
    file imports the reference fresh — order-independent."""
    from conftest import reference_shims

    if REF not in sys.path:
        sys.path.insert(0, REF)
    ctx = reference_shims()
    ctx.__enter__()
    request.addfinalizer(lambda: ctx.__exit__(None, None, None))

    def scatter_sum(src, index, dim=0, dim_size=None):
        dim = dim % src.dim()
        size = list(src.shape)
        size[dim] = dim_size
        out = torch.zeros(size, dtype=src.dtype)
        return out.index_add_(dim, index, src)

    ts = types.ModuleType("torch_scatter")
    ts.scatter_sum = scatter_sum
    sys.modules["torch_scatter"] = ts

    lt = types.ModuleType("dpvo.lietorch")
    lt.SE3 = SE3Shim
    lt.Sim3 = SE3Shim
    sys.modules["dpvo.lietorch"] = lt

    fastba = types.ModuleType("dpvo.fastba")
    sys.modules["dpvo.fastba"] = fastba
    ut = types.ModuleType("dpvo.utils")
    class _T:
        def __init__(self, *a, **k):
            pass
        def __enter__(self):
            return self
        def __exit__(self, *a):
            return False
    ut.Timer = _T
    sys.modules["dpvo.utils"] = ut

    import importlib
    import dpvo.projective_ops  # noqa: F401 (shares the shimmed lietorch)
    ba = importlib.import_module("dpvo.ba")
    return ba


def test_ba_matches_reference_python_ba(ref_ba):
    torch.manual_seed(0)
    rng = np.random.default_rng(0)

    n, Nk, P = 5, 15, 3
    fx = fy = 40.0
    cx, cy = 32.0, 24.0

    xi = 0.05 * rng.normal(size=(n, 6)).astype(np.float32)
    poses_t = _se3_exp(torch.from_numpy(xi))             # [n, 7] w2c
    patches_np = np.zeros((Nk, 3, P, P), np.float32)
    ctr = rng.uniform(12, 50, size=(Nk, 1, 1, 2))
    offs = np.arange(3) - 1
    patches_np[:, 0] = ctr[..., 0] + offs[None, None, :]
    patches_np[:, 1] = ctr[..., 1] + offs[None, :, None]
    patches_np[:, 2] = rng.uniform(0.5, 2.0, size=(Nk, 1, 1))

    ii, jj, kk = [], [], []
    for k in range(Nk):
        i = k % n
        for j in range(n):
            if j != i:
                ii.append(i), jj.append(j), kk.append(k)
    ii = np.asarray(ii)
    jj = np.asarray(jj)
    kk = np.asarray(kk)
    E = len(ii)

    intr_t = torch.tensor([fx, fy, cx, cy]).repeat(n, 1)[None]
    import dpvo.projective_ops as rpops
    with torch.no_grad():
        coords = rpops.transform(
            SE3Shim(poses_t[None]), torch.from_numpy(patches_np)[None],
            intr_t, torch.from_numpy(ii), torch.from_numpy(jj),
            torch.from_numpy(kk))
    targets_t = (coords[..., P // 2, P // 2, :]
                 + 0.5 * torch.randn(1, E, 2))
    weights_t = torch.rand(1, E, 2) * 0.5 + 0.5

    bounds = [-64, -64, 2 * cx + 64, 2 * cy + 64]
    ref_poses, ref_patches = ref_ba.BA(
        SE3Shim(poses_t.clone()[None]), torch.from_numpy(patches_np)[None],
        intr_t, targets_t.clone(), weights_t.clone(),
        1e-4, torch.from_numpy(ii), torch.from_numpy(jj),
        torch.from_numpy(kk), bounds, ep=1.0, fixedp=1,
        patches_est=torch.zeros(1, Nk, 3, P, P))

    # ---- ours on identical inputs ------------------------------------
    import jax.numpy as jnp

    from wild_video_3d_reconstruction_tpu.ba.gauss_newton import (
        BAConfig, bundle_adjust)

    cfg = BAConfig(window=n, patch_slots=Nk, iterations=1,
                   ep=1.0, lm=1e-4)
    poses_j, patches_j = bundle_adjust(
        jnp.asarray(poses_t.numpy()), jnp.asarray(patches_np),
        jnp.asarray([fx, fy, cx, cy]),
        jnp.asarray(targets_t[0].numpy()),
        jnp.asarray(weights_t[0].numpy()), 1e-4,
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk),
        jnp.ones(E, bool), t0=jnp.int32(1), t1=jnp.int32(n),
        m_base=jnp.int32(0), cfg=cfg,
        patches_est=jnp.zeros((Nk, 3, P, P)))

    ref_p = ref_poses.data[0].numpy()
    our_p = np.asarray(poses_j)
    np.testing.assert_allclose(our_p[:n], ref_p[:n], atol=2e-4)

    ref_d = ref_patches[0, :, 2, 1, 1].numpy()
    our_d = np.asarray(patches_j[:, 2, 1, 1])
    np.testing.assert_allclose(our_d, ref_d, atol=2e-4)


def test_projective_ops_match_reference(ref_ba):
    """transform / flow_mag center coordinates vs the reference
    `projective_ops.py` on identical state (same SE3 shim)."""
    import dpvo.projective_ops as rpops

    import jax.numpy as jnp

    from wild_video_3d_reconstruction_tpu.ops import projective as pops

    rng = np.random.default_rng(1)
    n, Nk, P = 4, 10, 3
    xi = 0.04 * rng.normal(size=(n, 6)).astype(np.float32)
    poses_t = _se3_exp(torch.from_numpy(xi))
    patches_np = np.zeros((Nk, 3, P, P), np.float32)
    ctr = rng.uniform(12, 40, size=(Nk, 1, 1, 2))
    offs = np.arange(3) - 1
    patches_np[:, 0] = ctr[..., 0] + offs[None, None, :]
    patches_np[:, 1] = ctr[..., 1] + offs[None, :, None]
    patches_np[:, 2] = rng.uniform(0.5, 2.0, size=(Nk, 1, 1))
    intr = np.array([40.0, 41.0, 32.0, 24.0], np.float32)
    intr_t = torch.from_numpy(intr).repeat(n, 1)[None]

    kk = np.arange(Nk)
    ii = kk % n
    jj = (kk + 1) % n

    with torch.no_grad():
        ref_c = rpops.transform(
            SE3Shim(poses_t[None]), torch.from_numpy(patches_np)[None],
            intr_t, torch.from_numpy(ii), torch.from_numpy(jj),
            torch.from_numpy(kk))[0].numpy()
        ref_fm = rpops.flow_mag(
            SE3Shim(poses_t[None]), torch.from_numpy(patches_np)[None],
            intr_t, torch.from_numpy(ii), torch.from_numpy(jj),
            torch.from_numpy(kk), beta=0.5)[0].numpy()

    intr_rows = jnp.tile(jnp.asarray(intr)[None], (n, 1))
    our_c = np.asarray(pops.transform(
        jnp.asarray(poses_t.numpy()), jnp.asarray(patches_np),
        intr_rows, jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk)))
    our_fm = np.asarray(pops.flow_mag(
        jnp.asarray(poses_t.numpy()), jnp.asarray(patches_np),
        intr_rows, jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk),
        beta=0.5))

    np.testing.assert_allclose(our_c, ref_c, atol=1e-4)
    np.testing.assert_allclose(our_fm, ref_fm, atol=1e-4)
