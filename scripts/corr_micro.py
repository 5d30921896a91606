"""Stage-level timing of the v1 Pallas correlation path at a config's
edge-table shape: kernel surfaces alone, surfaces + window extraction,
and the full feature (extraction + blend + unsort gather). Identifies
whether the kernel or the XLA extraction passes dominate at scale.

Run: python -u scripts/corr_micro.py [--config configs/default.yaml]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/default.yaml")
    ap.add_argument("--live-frac", type=float, default=0.8)
    ap.add_argument("--n", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from wild_video_3d_reconstruction_tpu.ops import pallas_corr as pc
    from wild_video_3d_reconstruction_tpu.ops import projective as pops
    from wild_video_3d_reconstruction_tpu.slam import DPVO
    from wild_video_3d_reconstruction_tpu.utils.config import load_config

    HT, WD = 384, 512
    cfg = load_config(args.config, BUFFER_SIZE=256)
    slam = DPVO(cfg, None, HT, WD, seed=0)
    slam._probe = lambda *a: 100.0
    rng = np.random.default_rng(0)
    big = rng.integers(0, 255, (HT + 256, WD + 256, 3), dtype=np.uint8)
    intr = np.array([400.0, 400.0, WD / 2, HT / 2])
    for t in range(12):
        y, x = (5 * t) % 256, (7 * t) % 256
        slam(t, np.ascontiguousarray(big[y:y + HT, x:x + WD]),
             intrinsics=intr)
    _ = np.asarray(slam.state.poses[:1])
    state = slam.state

    E_cap = state.ii.shape[0]
    E_live = int(E_cap * args.live_frac)
    n_live = int(state.n_edges)
    reps = (E_live + n_live - 1) // n_live
    ii = np.tile(np.asarray(state.ii[:n_live]), reps)[:E_live]
    jj = np.tile(np.asarray(state.jj[:n_live]), reps)[:E_live]
    kk = np.tile(np.asarray(state.kk[:n_live]), reps)[:E_live]
    pad = E_cap - E_live
    state = state._replace(
        ii=jnp.asarray(np.concatenate([ii, np.zeros(pad, np.int32)])),
        jj=jnp.asarray(np.concatenate([jj, np.zeros(pad, np.int32)])),
        kk=jnp.asarray(np.concatenate([kk, np.zeros(pad, np.int32)])),
        valid=jnp.asarray(np.arange(E_cap) < E_live),
        n_edges=jnp.asarray(E_live, jnp.int32))
    print(f"E_cap={E_cap}, live={E_live} ({args.live_frac:.0%})")

    M, pmem = cfg.PATCHES_PER_FRAME, cfg.pmem
    F = state.fmap1.shape[0]

    def prep(s):
        coords = pops.transform(s.poses, s.patches, s.intrinsics,
                                s.ii, s.jj, s.kk)
        coords = jnp.where(s.valid[:, None, None, None], coords,
                           0.0).astype(jnp.float32)
        kkm = jnp.mod(s.kk, M * pmem)
        jjm = jnp.mod(s.jj, pmem)
        E = coords.shape[0]
        eb = pc.EB_LARGE if E >= pc.EB_SWITCH else pc.EB
        n_slots = ((E + eb - 1) // eb) * eb + (F + 1) * eb
        bucketing = pc._bucket_by_frame(jjm, F, n_slots, valid=s.valid,
                                        eb=eb)
        slot_edge, _, _ = bucketing
        g = jnp.moveaxis(s.gmap[kkm], 1, -1).reshape(E, pc.P2, -1)
        g = jnp.pad(g, ((0, 1), (0, pc.P16 - pc.P2), (0, 0))
                    ).astype(jnp.bfloat16)
        return coords, bucketing, g[slot_edge], n_slots

    def surfaces_only(s):
        """Both levels, kernel only (bucketing+gather included)."""
        coords, bucketing, g_slots, n_slots = prep(s)
        slot_edge, _, block_meta = bucketing
        outs = []
        for fmap, sc in ((s.fmap1, 1), (s.fmap2, 4)):
            c = coords / sc
            E = c.shape[0]
            F_, H, W, C = fmap.shape
            pad_h = max(pc.PAD, pc.RSH - (H + pc.PAD))
            pad_w = max(pc.PAD, pc.RSW - (W + pc.PAD))
            fmap_pad = jnp.pad(fmap.astype(jnp.bfloat16),
                               ((0, 0), (pc.PAD, pad_h), (pc.PAD, pad_w),
                                (0, 0)))
            Hp, Wp = H + pc.PAD + pad_h, W + pc.PAD + pad_w
            ystart = (jnp.floor(c[..., 1]).astype(jnp.int32) - 3 + pc.PAD
                      ).reshape(E, pc.P2)
            xstart = (jnp.floor(c[..., 0]).astype(jnp.int32) - 3 + pc.PAD
                      ).reshape(E, pc.P2)
            oy = jnp.clip(jnp.min(ystart, 1), 0, Hp - pc.RSH)
            ox = jnp.clip((jnp.min(xstart, 1) // 16) * 16, 0,
                          ((Wp - pc.RSW) // 16) * 16)
            origin = jnp.stack([oy, ox], -1)
            origin = jnp.concatenate(
                [origin, jnp.zeros((1, 2), jnp.int32)], 0)
            outs.append(pc._surfaces(fmap_pad, block_meta,
                                     origin[slot_edge], g_slots, n_slots))
        return outs[0][:64], outs[1][:64]

    def full(s):
        coords, bucketing, g_slots, n_slots = prep(s)
        outs = []
        for fmap, sc in ((s.fmap1, 1), (s.fmap2, 4)):
            out = pc._pallas_corr_level(g_slots, fmap.astype(jnp.bfloat16),
                                        coords / sc, jnp.mod(s.jj, pmem),
                                        n_slots, bucketing)
            outs.append(out.reshape(n_slots, -1).astype(jnp.bfloat16))
        slot_edge, slot_of_edge, _ = bucketing
        feat = jnp.stack(outs, -1).reshape(n_slots, -1)
        return feat[jnp.clip(slot_of_edge, 0, n_slots - 1)][:64]

    def bucketing_only(s):
        coords, bucketing, g_slots, n_slots = prep(s)
        return coords[:16], bucketing[0][:16], g_slots[:16]

    def timeit(fn, n=args.n, warmup=3):
        f = jax.jit(fn)
        for _ in range(warmup):
            out = f(state)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(state)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        return (time.perf_counter() - t0) / n * 1000.0

    tb = timeit(bucketing_only)
    print(f"bucketing + g gather:          {tb:8.2f} ms")
    ts = timeit(surfaces_only)
    print(f"  + kernel surfaces (2 lvl):   {ts:8.2f} ms")
    tf = timeit(full)
    print(f"  + extract/blend/unsort:      {tf:8.2f} ms")
    print(f"=> kernel {ts - tb:.1f} ms, extraction {tf - ts:.1f} ms")


if __name__ == "__main__":
    main()
