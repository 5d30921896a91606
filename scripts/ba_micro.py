"""Microbenchmark BA internals at the default-config tier size on TPU.

Times: full bundle_adjust (2 GN), one _gn_iteration, _group_by_patch
(the argsort), _edge_system, and the one-hot pair accumulation — to find
where the 62 ms goes at E=88k, W=12, M=9600.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from wild_video_3d_reconstruction_tpu.ba import gauss_newton as gn

E = 88064          # default-config tier-0 prefix
W, M, CAP = 12, 9600, 28
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
valid = jnp.asarray(rng.random(E) < 0.5)
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
    return (time.perf_counter() - t) / n * 1000


f_ba = jax.jit(lambda p, z: gn._bundle_adjust_impl(
    p, z, intr, target, weight, 1e-4, ii, jj, kk, valid, t0, t1, m_base,
    cfg))
print(f"bundle_adjust (2 GN)   {timeit(lambda: f_ba(poses, patches)):8.2f} ms")

f_it = jax.jit(lambda p, z: gn._gn_iteration(
    p, z, intr, target, weight, 1e-4, ii, jj, kk,
    valid.astype(jnp.float32), t0, t1, m_base, cfg))
print(f"_gn_iteration (1)      {timeit(lambda: f_it(poses, patches)):8.2f} ms")

q = kk - m_base
okq = (q >= 0) & (q < M)
f_grp = jax.jit(lambda qq: gn._group_by_patch(qq, okq, M, CAP))
print(f"_group_by_patch (sort) {timeit(lambda: f_grp(q)):8.2f} ms")

f_es = jax.jit(lambda p, z: gn._edge_system(p, z, intr, target, ii, jj, kk,
                                            cfg))
print(f"_edge_system           {timeit(lambda: f_es(poses, patches)):8.2f} ms")


def pair_acc(p, z):
    r, Ji, Jj, Jz, mask = gn._edge_system(p, z, intr, target, ii, jj, kk,
                                          cfg)
    w = weight * (mask * valid.astype(jnp.float32))[:, None]
    li, lj = ii - t0, jj - t0
    oki = (li >= 0) & (li < (t1 - t0)) & (li < W)
    okj = (lj >= 0) & (lj < (t1 - t0)) & (lj < W)
    iw = jnp.arange(W)
    oh_i = ((li[:, None] == iw) & oki[:, None]).astype(jnp.float32)
    oh_j = ((lj[:, None] == iw) & okj[:, None]).astype(jnp.float32)
    wJi = w[:, :, None] * Ji
    wJj = w[:, :, None] * Jj

    def pair_sum(A, oh_r, oh_c):
        pair = jnp.einsum("ew,ev->ewv", oh_r, oh_c).reshape(E, W * W)
        return jnp.dot(pair.T, A.reshape(E, 36),
                       preferred_element_type=jnp.float32)

    Bii = jnp.einsum("eri,erj->eij", wJi, Ji)
    Bij = jnp.einsum("eri,erj->eij", wJi, Jj)
    Bji = jnp.einsum("eri,erj->eij", wJj, Ji)
    Bjj = jnp.einsum("eri,erj->eij", wJj, Jj)
    return (pair_sum(Bii, oh_i, oh_i) + pair_sum(Bij, oh_i, oh_j)
            + pair_sum(Bji, oh_j, oh_i) + pair_sum(Bjj, oh_j, oh_j))


f_pair = jax.jit(pair_acc)
print(f"edge_sys+pair_sums     {timeit(lambda: f_pair(poses, patches)):8.2f} ms")
