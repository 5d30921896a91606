"""BA stage decomposition at tier sizes (round 4).

Splits one _gn_iteration into: edge system, pair (pose-Hessian) sums,
depth-table accumulation (gather + one-hot einsum), Schur assembly
(EQ @ Em^T at [6W, M]), and the dense Cholesky solve + retractions — to
find the "~8 ms unprofiled" portion (r3 ledger) at the new 55k tier.

Run: python -u scripts/ba_micro2.py [--e 55296]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from wild_video_3d_reconstruction_tpu.ba import gauss_newton as gn

ap = argparse.ArgumentParser()
ap.add_argument("--e", type=int, default=55296)
ap.add_argument("--w", type=int, default=12)
ap.add_argument("--m", type=int, default=9600)
args = ap.parse_args()

E, W, M, CAP = args.e, args.w, args.m, 28
N = 256

rng = np.random.default_rng(0)
poses = jnp.asarray(np.tile([0, 0, 0, 0, 0, 0, 1.0], (N, 1)), jnp.float32)
patches = jnp.asarray(rng.uniform(10, 50, (N * 384, 3, 3, 3)), jnp.float32)
intr = jnp.asarray([120.0, 120.0, 64.0, 48.0], jnp.float32)
target = jnp.asarray(rng.uniform(0, 100, (E, 2)), jnp.float32)
weight = jnp.asarray(rng.uniform(0, 1, (E, 2)), jnp.float32)
ii = jnp.asarray(rng.integers(0, 30, E), jnp.int32)
jj = jnp.asarray(rng.integers(0, 30, E), jnp.int32)
kk = jnp.asarray(rng.integers(0, 30 * 384, E), jnp.int32)
valid = jnp.asarray(rng.random(E) < 0.85)
t0, t1 = jnp.int32(18), jnp.int32(30)
m_base = jnp.int32(0)
cfg = gn.BAConfig(window=W, patch_slots=M, iterations=2, per_patch_cap=CAP)


def timeit(fn, n=20, warmup=3):
    for _ in range(warmup):
        out = fn()
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t = time.perf_counter()
    for _ in range(n):
        out = fn()
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t) / n * 1000.0


q = kk - m_base
okq = (q >= 0) & (q < M)
table = jnp.asarray(gn._group_by_patch(q, okq, M, CAP))

f_ba = jax.jit(lambda p, z: gn._bundle_adjust_impl(
    p, z, intr, target, weight, 1e-4, ii, jj, kk,
    valid.astype(jnp.float32), t0, t1, m_base, cfg, patch_table=table))
print(f"bundle_adjust (2 GN)    {timeit(lambda: f_ba(poses, patches)):8.2f} ms")

f_es = jax.jit(lambda p, z: gn._edge_system(p, z, intr, target, ii, jj, kk,
                                            cfg))
print(f"_edge_system            {timeit(lambda: f_es(poses, patches)):8.2f} ms")

r, Ji, Jj, Jz, mask = [jnp.asarray(x) for x in f_es(poses, patches)]
w = weight * (mask * valid.astype(jnp.float32))[:, None]
li, lj = ii - t0, jj - t0
oki = (li >= 0) & (li < (t1 - t0)) & (li < W)
okj = (lj >= 0) & (lj < (t1 - t0)) & (lj < W)


def pair_part(w, Ji, Jj):
    wJi = w[:, :, None] * Ji
    wJj = w[:, :, None] * Jj
    iw = jnp.arange(W)

    def pair_sum(A, pid, ok):
        pair = ((pid[:, None] == jnp.arange(W * W)) &
                ok[:, None]).astype(jnp.float32)
        return jnp.dot(pair.T, A.reshape(E, 36),
                       preferred_element_type=jnp.float32)

    Bii = jnp.einsum("eri,erj->eij", wJi, Ji)
    Bij = jnp.einsum("eri,erj->eij", wJi, Jj)
    Bjj = jnp.einsum("eri,erj->eij", wJj, Jj)
    return (pair_sum(Bii, li * W + li, oki)
            + pair_sum(Bij, li * W + lj, oki & okj)
            + pair_sum(Bjj, lj * W + lj, okj))


f_pair = jax.jit(pair_part)
print(f"pair sums (3x)          {timeit(lambda: f_pair(w, Ji, Jj)):8.2f} ms")


def depth_part(w, Ji, Jj, Jz, r):
    wJz = w * Jz
    cu = jnp.stack([jnp.sum(wJz * Jz, -1), jnp.sum(wJz * r, -1),
                    mask * valid.astype(jnp.float32)], -1)
    Eik = jnp.einsum("er,eri->ei", wJz, Ji)
    Ejk = jnp.einsum("er,eri->ei", wJz, Jj)
    vals = jnp.concatenate([cu, Eik, Ejk], axis=-1)
    vals = jnp.concatenate([vals, jnp.zeros((1, 15))], axis=0)
    li_m = jnp.concatenate([jnp.where(oki, li, -1),
                            jnp.full((1,), -1, li.dtype)])
    lj_m = jnp.concatenate([jnp.where(okj, lj, -1),
                            jnp.full((1,), -1, lj.dtype)])
    g = vals[table]
    accu = jnp.sum(g[..., :3], axis=1)
    iw = jnp.arange(W)
    ohi_t = (li_m[table][..., None] == iw).astype(jnp.float32)
    ohj_t = (lj_m[table][..., None] == iw).astype(jnp.float32)
    Em_m = (jnp.einsum("mcw,mcd->mwd", ohi_t, g[..., 3:9])
            + jnp.einsum("mcw,mcd->mwd", ohj_t, g[..., 9:15]))
    return accu, Em_m.transpose(1, 2, 0).reshape(6 * W, M)


f_depth = jax.jit(depth_part)
print(f"depth table + Em        "
      f"{timeit(lambda: f_depth(w, Ji, Jj, Jz, r)):8.2f} ms")

accu, Em = [jnp.asarray(x) for x in f_depth(w, Ji, Jj, Jz, r)]
C, u = accu[:, 0], accu[:, 1]
Brand = jnp.asarray(rng.normal(size=(6 * W, 6 * W)), jnp.float32)
B = Brand @ Brand.T + 10.0 * jnp.eye(6 * W)
v = jnp.asarray(rng.normal(size=(6 * W,)), jnp.float32)


def schur_solve(B, Em, C, u, v):
    Q = 1.0 / (C + 1e-4)
    EQ = Em * Q[None, :]
    S = B - EQ @ Em.T
    y = v - EQ @ u
    diag = jnp.diag_indices(6 * W)
    S = S.at[diag].add(1e-4 * S[diag] + 1.0)
    L = jax.scipy.linalg.cho_factor(S, lower=True)
    dX = jax.scipy.linalg.cho_solve(L, y)
    dZ = Q * (u - Em.T @ dX)
    return dX, dZ


f_schur = jax.jit(schur_solve)
print(f"schur + cholesky        "
      f"{timeit(lambda: f_schur(B, Em, C, u, v)):8.2f} ms")


def chol_only(S, y):
    L = jax.scipy.linalg.cho_factor(S, lower=True)
    return jax.scipy.linalg.cho_solve(L, y)


S0 = jnp.asarray(B)
f_chol = jax.jit(chol_only)
print(f"cholesky [72,72] only   {timeit(lambda: f_chol(S0, v)):8.2f} ms")

f_grp = jax.jit(lambda q: gn._group_by_patch(q, okq, M, CAP))
print(f"_group_by_patch (sort)  {timeit(lambda: f_grp(q)):8.2f} ms")
