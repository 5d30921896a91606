"""Update-operator stage decomposition at tier sizes (round 4).

The full update_forward measures ~12 ms at the 55k tier with ~1.7% MFU —
this times each substage to locate the slack: corr encoder, neighbor
message gathers+MLPs, the two SoftAggs (scatter vs dense formulations),
the gated-residual GRU pair, and the heads.

Run: python -u scripts/gru_micro.py [--e 55296]
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

from wild_video_3d_reconstruction_tpu.models import update as upd
from wild_video_3d_reconstruction_tpu.models.layers import layer_norm, linear
from wild_video_3d_reconstruction_tpu.ops import segment

ap = argparse.ArgumentParser()
ap.add_argument("--e", type=int, default=55296)
ap.add_argument("--kk-segs", type=int, default=9601)
ap.add_argument("--ij-segs", type=int, default=677)
args = ap.parse_args()

E, D = args.e, upd.DIM
rng = np.random.default_rng(0)
params = upd.init_update(jax.random.PRNGKey(0))
fd = jnp.bfloat16
net = jnp.asarray(rng.normal(size=(E, D)), fd)
inp = jnp.asarray(rng.normal(size=(E, D)), fd)
corr = jnp.asarray(rng.normal(size=(E, 882)), fd)
kk_seg = jnp.asarray(rng.integers(0, args.kk_segs - 1, E), jnp.int32)
ij_seg = jnp.asarray(rng.integers(0, args.ij_segs - 1, E), jnp.int32)
nbr_ix = jnp.asarray(rng.integers(-1, E, E), jnp.int32)
nbr_jx = jnp.asarray(rng.integers(-1, E, E), jnp.int32)
valid = jnp.asarray(rng.random(E) < 0.85)


def timeit(fn, *a, n=20, warmup=3):
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(*a)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t) / n * 1000.0


print(f"full update_forward      "
      f"{timeit(lambda n_, i_, c_: upd.update_forward(params, n_, i_, c_, kk_seg, ij_seg, nbr_ix, nbr_jx, valid, args.kk_segs, args.ij_segs), net, inp, corr):8.2f} ms")
print(f"corr encoder             "
      f"{timeit(lambda c_: upd._corr_encoder(params['corr'], c_), corr):8.2f} ms")


def msgs(n_):
    mask_ix = ((nbr_ix >= 0) & valid).astype(n_.dtype)[:, None]
    mask_jx = ((nbr_jx >= 0) & valid).astype(n_.dtype)[:, None]
    n_ = n_ + upd._mlp2(params["c1"], mask_ix * n_[jnp.clip(nbr_ix, 0, None)])
    n_ = n_ + upd._mlp2(params["c2"], mask_jx * n_[jnp.clip(nbr_jx, 0, None)])
    return n_


print(f"nbr gathers + c1/c2 MLPs "
      f"{timeit(msgs, net):8.2f} ms")
print(f"agg_kk (scatter, S=9601) "
      f"{timeit(lambda n_: upd._soft_agg(params['agg_kk'], n_, kk_seg, args.kk_segs, valid), net):8.2f} ms")
print(f"agg_ij (dense,  S=677)   "
      f"{timeit(lambda n_: upd._soft_agg(params['agg_ij'], n_, ij_seg, args.ij_segs, valid), net):8.2f} ms")


def gru(n_):
    n_ = layer_norm(params["gru"]["0"], n_, eps=1e-3)
    n_ = upd._gated_residual(params["gru"]["1"], n_)
    n_ = layer_norm(params["gru"]["2"], n_, eps=1e-3)
    n_ = upd._gated_residual(params["gru"]["3"], n_)
    return n_


print(f"2x (LN + gated residual) "
      f"{timeit(gru, net):8.2f} ms")


def agg_kk_table(n_):
    from wild_video_3d_reconstruction_tpu.ba.gauss_newton import \
        _group_by_patch
    table = _group_by_patch(kk_seg, kk_seg < args.kk_segs - 1,
                            args.kk_segs - 1, 28)
    f = linear(params["agg_kk"]["f"], n_)
    g = linear(params["agg_kk"]["g"], n_)
    y = segment.segment_softmax_weighted_sum_table(f, g, table, kk_seg,
                                                   valid)
    return linear(params["agg_kk"]["h"], y)


print(f"agg_kk via member table  "
      f"{timeit(agg_kk_table, net):8.2f} ms   (incl. its own sort)")


def agg_kk_sorted(n_):
    key = jnp.where(valid & (kk_seg < args.kk_segs - 1), kk_seg,
                    jnp.int32(args.kk_segs - 1))
    order = jnp.argsort(key, stable=True)
    f = linear(params["agg_kk"]["f"], n_)
    g = linear(params["agg_kk"]["g"], n_)
    y = segment.segment_softmax_weighted_sum_sorted(
        f, g, kk_seg, args.kk_segs - 1, order, valid)
    return linear(params["agg_kk"]["h"], y)


def agg_kk_sorted_noorder(n_, order):
    f = linear(params["agg_kk"]["f"], n_)
    g = linear(params["agg_kk"]["g"], n_)
    y = segment.segment_softmax_weighted_sum_sorted(
        f, g, kk_seg, args.kk_segs - 1, order, valid)
    return linear(params["agg_kk"]["h"], y)


key0 = jnp.where(valid & (kk_seg < args.kk_segs - 1), kk_seg,
                 jnp.int32(args.kk_segs - 1))
order0 = jnp.argsort(key0, stable=True)
print(f"agg_kk sorted-cumsum     "
      f"{timeit(agg_kk_sorted, net):8.2f} ms   (incl. its own sort)")
print(f"agg_kk sorted (order in) "
      f"{timeit(agg_kk_sorted_noorder, net, order0):8.2f} ms")
