"""Jitted per-frame SLAM megafunctions.

The reference's per-frame work (`DPVO.__call__`, `dpvo/dpvo.py:771-875`) is
re-expressed as a handful of fixed-shape XLA programs threading a donated
`SLAMState`:

  insert_frame    encoders + patch selection + buffer writes + motion model
                  (`dpvo/dpvo.py:781-841`, `net.py:111-176`)
  motion_probe    trial update on the newest M edges -> median flow scalar
                  (`dpvo/dpvo.py:366-381`)
  track_step      edge append + reproject + correlation + update operator +
                  bundle adjustment + keyframe flow metric
                  (`dpvo/dpvo.py:711-749,855-867,605-611`)
  update_only     the optimization inner loop alone (bootstrap / refinement)
  keyframe_shift  keyframe eviction: buffer shift-left by gather, edge
                  renumbering, edge retirement (`dpvo/dpvo.py:605-658`)
  retire_edges    age-based edge retirement + stable compaction (`:657`)

Host<->device traffic per frame is a couple of scalars (probe metric, flow
magnitude, relative pose on eviction) — everything else stays resident.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp

from ..ba.gauss_newton import (BAConfig, _bundle_adjust_impl,
                               _group_by_patch, bundle_adjust)
from ..models import vonet
from ..models.update import update_forward
from ..models.vonet import DIM, P, RES
from ..ops import lie
from ..ops import projective as pops
from ..ops.corr import patch_corr_pyramid
from ..ops.patchify import avg_pool2d
from ..ops.segment import (compact_valid, neighbors,
                           neighbors_from_sorted)
from .state import SLAMState


def _feat_dtype(cfg):
    return jnp.bfloat16 if cfg.MIXED_PRECISION else jnp.float32


# ---------------------------------------------------------------------------
# frame insertion
# ---------------------------------------------------------------------------

def insert_frame(cfg, params, state: SLAMState, image, intrinsics, key, fac,
                 tstamp, depth=None, mask=None, initialized=False,
                 desc_centers=None):
    """Insert the frame at slot n = state.n_frames (not yet accepted).

    image: [H, W, 3] uint8; intrinsics: [4] full-res; fac: motion-model
    timestamp ratio (host scalar); key: PRNG key, or None to draw from the
    device-resident state.rng (steady state — saves one host dispatch per
    frame); depth: optional [H, W] metric depth;
    mask: optional [H, W] bool (True = usable/static); desc_centers:
    optional VLAD centers — when given, the frame's global descriptor is
    computed here and logged at state.log_idx so the async loop-closure
    host drains descriptors in chunks instead of fetching feature maps.
    """
    M = cfg.PATCHES_PER_FRAME
    pmem = cfg.pmem
    n = state.n_frames

    feats = vonet.encode_frame(params, image, _feat_dtype(cfg))

    if desc_centers is not None:
        from ..loop.netvlad import vlad_extract
        d = vlad_extract(feats.fmap.astype(jnp.float32), desc_centers)
        state = state._replace(desc_log=state.desc_log.at[state.log_idx].set(
            d.astype(state.desc_log.dtype)))
    h4, w4 = feats.fmap.shape[0], feats.fmap.shape[1]

    if key is None:
        rng_next, k_sel, k_depth = jax.random.split(state.rng, 3)
        state = state._replace(rng=rng_next)
    else:
        k_sel, k_depth = jax.random.split(key)
    gmap_bias = vonet.image_gradient_map(image) if cfg.GRADIENT_BIAS else None
    kp_map = (vonet.keypoint_response_map(image)
              if getattr(cfg, "PATCH_SELECTOR", "random") == "keypoints"
              else None)
    coords = vonet.select_patches(k_sel, M, h4, w4, gradient_map=gmap_bias,
                                  mask=mask if gmap_bias is None else None,
                                  keypoint_map=kp_map)
    imap_p, gmap_p, clr, patches = vonet.gather_patches(feats, image, coords)

    # ---- patch inverse-depth initialization ------------------------------
    # default: per-patch uniform random (`dpvo/dpvo.py:818`); "median"
    # follows upstream DPVO's steady-state policy (new patches start at
    # the median inverse depth of the last 3 frames) — much less depth
    # noise per frame, which matters at small PATCHES_PER_FRAME
    d0 = jax.random.uniform(k_depth, (M,))
    if initialized and getattr(cfg, "DEPTH_INIT", "random") == "median":
        lo = jnp.maximum(n - 3, 0) * M
        win = jax.lax.dynamic_slice_in_dim(state.patches, lo, 3 * M, 0)
        d0 = jnp.broadcast_to(jnp.median(win[:, 2]), (M,))
    patches = patches.at[:, 2].set(
        jnp.broadcast_to(d0[:, None, None], (M, P, P)))
    patches_est_row = jnp.zeros_like(patches)

    if depth is not None:
        depth_f = depth.astype(jnp.float32)
        if initialized and mask is not None:
            # scale-align the metric prior to the current map scale
            # (`dpvo/dpvo.py:819-825`)
            lo = jnp.maximum(n - 3, 0) * M
            win = jax.lax.dynamic_slice_in_dim(state.patches, lo, 3 * M, 0)
            s = jnp.median(win[:, 2])
            ref_med = jnp.nanmedian(jnp.where(mask, depth_f, jnp.nan))
            depth_f = (1.0 / jnp.maximum(s, 1e-6)) / jnp.maximum(
                ref_med, 1e-6) * depth_f
        # per-patch prior: 1 / median(depth at the patch's 3x3 full-res
        # pixels) (`dpvo/patchgraph.py:97-110`)
        H, W = depth_f.shape
        px = jnp.clip((patches[:, 0] * RES).astype(jnp.int32), 0, W - 1)
        py = jnp.clip((patches[:, 1] * RES).astype(jnp.int32), 0, H - 1)
        samples = depth_f[py, px].reshape(M, -1)
        med = jnp.median(samples, axis=1)
        inv = 1.0 / jnp.maximum(med, 1e-6)
        patches = patches.at[:, 2].set(
            jnp.broadcast_to(inv[:, None, None], (M, P, P)))
        patches_est_row = patches

    # ---- damped-linear motion extrapolation ------------------------------
    # (`dpvo/dpvo.py:802-815`)
    P1 = state.poses[jnp.maximum(n - 1, 0)]
    P2 = state.poses[jnp.maximum(n - 2, 0)]
    xi = cfg.MOTION_DAMPING * fac * lie.se3_log(
        lie.se3_mul(P1, lie.se3_inv(P2)))
    pred = lie.se3_mul(lie.se3_exp(xi), P1)
    new_pose = jnp.where(n > 1, pred, jnp.where(n > 0, P1, state.poses[n]))

    # ---- buffer writes ---------------------------------------------------
    slot = jnp.mod(n, pmem)
    fd = _feat_dtype(cfg)
    state = state._replace(
        poses=state.poses.at[n].set(new_pose),
        patches=jax.lax.dynamic_update_slice_in_dim(
            state.patches, patches, n * M, 0),
        patches_est=jax.lax.dynamic_update_slice_in_dim(
            state.patches_est, patches_est_row, n * M, 0),
        intrinsics=state.intrinsics.at[n].set(
            intrinsics.astype(jnp.float32) / RES),
        colors=state.colors.at[n].set(
            jnp.clip(clr, 0, 255).astype(jnp.uint8)),
        imap=jax.lax.dynamic_update_slice_in_dim(
            state.imap, imap_p.astype(fd), slot * M, 0),
        gmap=jax.lax.dynamic_update_slice_in_dim(
            state.gmap, gmap_p.astype(fd), slot * M, 0),
        fmap1=state.fmap1.at[slot].set(feats.fmap.astype(fd)),
        fmap2=state.fmap2.at[slot].set(
            avg_pool2d(feats.fmap, 4).astype(fd)),
    )
    return state


# ---------------------------------------------------------------------------
# shared: run the update operator over an edge list
# ---------------------------------------------------------------------------

def _run_update_net(cfg, params, state: SLAMState, net, ii, jj, kk, valid, n,
                    order=None, kk_table=None, nbr=None, agg_order=None):
    """reproject -> correlate -> update operator. Returns
    (net', delta, weight, coords). order: optional shared stable ordering
    by (invalid, kk) for the neighbor links; kk_table: optional [S, cap]
    per-patch member table reused for the SoftAgg patch groups; nbr:
    optional precomputed (nbr_ix, nbr_jx) — update_op derives them from
    the BA patch table (ops.segment.neighbors_from_table), replacing the
    neighbor argsort; agg_order: optional segment sort (the okq_prefix
    table order) routing the kk-SoftAgg through the banded MXU run-sum
    kernel instead of the scatter path (ops.pallas_segsum)."""
    M = cfg.PATCHES_PER_FRAME
    pmem = cfg.pmem
    fd = _feat_dtype(cfg)

    coords = pops.transform(state.poses, state.patches, state.intrinsics,
                            ii, jj, kk)                     # [E, P, P, 2]
    coords = jnp.where(valid[:, None, None, None], coords, 0.0)

    if cfg.PALLAS_CORR and jax.default_backend() != "cpu":
        from ..ops.pallas_corr import patch_corr_pyramid_pallas
        corr = patch_corr_pyramid_pallas(
            state.gmap, (state.fmap1, state.fmap2),
            coords.astype(jnp.float32),
            jnp.mod(kk, M * pmem), jnp.mod(jj, pmem),
            radius=3, valid=valid,
            fused=getattr(cfg, "PALLAS_FUSED", False),
            variant=getattr(cfg, "PALLAS_VARIANT", "x32"),
            hybrid_budget=getattr(cfg, "PALLAS_HYBRID_BUDGET",
                                  0))                       # [E, 882]
    else:
        corr = patch_corr_pyramid(
            state.gmap, (state.fmap1, state.fmap2),
            coords.astype(jnp.float32),
            jnp.mod(kk, M * pmem), jnp.mod(jj, pmem),
            radius=3, valid=valid, chunk=cfg.CORR_CHUNK)    # [E, 882]

    ctx = state.imap[jnp.mod(kk, M * pmem)]

    # bounded segment ids for the SoftAgg groups
    FW = cfg.frame_window
    kb = jnp.maximum(n - (FW - 1), 0) * M
    fb = jnp.maximum(n - (FW - 1), 0)
    kk_seg = jnp.clip(kk - kb, 0, cfg.patch_slots)
    kk_seg = jnp.where(valid, kk_seg, cfg.patch_slots)
    li = jnp.clip(ii - fb, 0, FW)
    lj = jnp.clip(jj - fb, 0, FW)
    ij_seg = jnp.where(valid, li * (FW + 1) + lj, (FW + 1) * (FW + 1))

    nbr_ix, nbr_jx = nbr if nbr is not None else \
        neighbors(kk, jj, valid=valid, order=order)

    net2, delta, weight = update_forward(
        params["update"], net.astype(fd), ctx.astype(fd), corr.astype(fd),
        kk_seg, ij_seg, nbr_ix, nbr_jx, valid,
        cfg.patch_slots + 1, (FW + 1) * (FW + 1) + 1, kk_table=kk_table,
        kk_order=agg_order)
    return net2, delta, weight, coords


# ---------------------------------------------------------------------------
# motion probe (pre-initialization gating)
# ---------------------------------------------------------------------------

def motion_probe(cfg, params, state: SLAMState):
    """Median flow-delta magnitude for trial edges (prev frame patches ->
    current frame). `dpvo/dpvo.py:366-381`."""
    M = cfg.PATCHES_PER_FRAME
    n = state.n_frames                      # current (not yet accepted) slot
    m = n * M
    kk = m - M + jnp.arange(M)
    jj = jnp.full((M,), 0, jnp.int32) + n
    ii = kk // M
    valid = jnp.ones((M,), bool)
    net = jnp.zeros((M, DIM), _feat_dtype(cfg))
    _, delta, _, _ = _run_update_net(cfg, params, state, net, ii, jj, kk,
                                     valid, n)
    return jnp.quantile(jnp.linalg.norm(delta.astype(jnp.float32), axis=-1),
                        0.5)


# ---------------------------------------------------------------------------
# edge lifecycle
# ---------------------------------------------------------------------------

def append_edges(cfg, state: SLAMState):
    """Append forward+backward factors for the newly accepted frame.

    Mirrors `__edges_forw` / `__edges_back` (`dpvo/dpvo.py:751-769`); the
    accepted frame index is c = n_frames - 1 (n_frames already incremented).
    """
    M = cfg.PATCHES_PER_FRAME
    r = cfg.PATCH_LIFETIME
    n = state.n_frames
    c = n - 1

    # forward: patches of frames [n-r, c) -> target c
    A_f = (r - 1) * M
    off_f = jnp.arange(A_f, dtype=jnp.int32)
    kk_f = M * c - A_f + off_f
    ii_f = kk_f // M
    jj_f = jnp.full((A_f,), 0, jnp.int32) + c
    ok_f = (kk_f >= M * jnp.maximum(n - r, 0)) & (kk_f >= 0)

    # backward: patches of frame c -> targets [n-r, n)
    grid_t = jnp.arange(r, dtype=jnp.int32)                 # target offsets
    tvals = n - r + grid_t                                  # [r]
    kk_b = (M * c + jnp.arange(M, dtype=jnp.int32))[:, None]  # [M, 1]
    kk_b = jnp.broadcast_to(kk_b, (M, r)).reshape(-1)
    jj_b = jnp.broadcast_to(tvals[None, :], (M, r)).reshape(-1)
    ii_b = kk_b // M
    ok_b = (jj_b >= 0)

    ii_new = jnp.concatenate([ii_f, ii_b])
    jj_new = jnp.concatenate([jj_f, jj_b])
    kk_new = jnp.concatenate([kk_f, kk_b])
    ok_new = jnp.concatenate([ok_f, ok_b])

    A = ii_new.shape[0]
    cur = state.n_edges
    upd = functools.partial(jax.lax.dynamic_update_slice_in_dim, axis=0)
    state = state._replace(
        ii=upd(state.ii, jnp.maximum(ii_new, 0), cur),
        jj=upd(state.jj, jnp.maximum(jj_new, 0), cur),
        kk=upd(state.kk, jnp.maximum(kk_new, 0), cur),
        valid=upd(state.valid, ok_new, cur),
        net=upd(state.net, jnp.zeros((A, DIM), state.net.dtype), cur),
        target=upd(state.target, jnp.zeros((A, 2), jnp.float32), cur),
        weight=upd(state.weight, jnp.zeros((A, 2), jnp.float32), cur),
        n_edges=cur + A,
    )
    return state


def retire_and_compact(cfg, state: SLAMState):
    """Drop edges whose source fell out of the removal window, then stable-
    compact the table (`dpvo/dpvo.py:657-658`). Both the compaction rank
    AND the permutation gathers only touch the live prefix tier — rows
    beyond it are dead and ride along as contiguous copies (the full-
    capacity row gathers, dominated by net [E, 384], measured 13.6 ms at
    default config)."""
    M = cfg.PATCHES_PER_FRAME
    n = state.n_frames
    E = state.valid.shape[0]
    keep = state.valid & (state.kk // M >= n - cfg.REMOVAL_WINDOW)

    def body(n_rows):
        def f(_):
            perm_p, n_valid = compact_valid(keep[:n_rows])

            def ap(a):
                if n_rows == E:
                    return a[perm_p]
                return jnp.concatenate([a[:n_rows][perm_p], a[n_rows:]],
                                       axis=0)

            return (ap(state.ii), ap(state.jj), ap(state.kk), ap(keep),
                    ap(state.net), ap(state.target), ap(state.weight),
                    n_valid)
        return f

    ii, jj, kk, valid, net, target, weight, n_valid = _run_tiered(
        state.n_edges, E, body, getattr(cfg, 'EDGE_TIERS', 2))
    return state._replace(ii=ii, jj=jj, kk=kk, valid=valid, net=net,
                          target=target, weight=weight, n_edges=n_valid)


# ---------------------------------------------------------------------------
# edge-prefix tiering: the table is prefix-compacted, so O(E) stages can run
# on the smallest static prefix covering state.n_edges; lax.cond executes
# only the taken branch. Capacity (`config.edge_capacity`) is the
# eviction-free worst case that real sequences only approach during long
# no-keyframe stretches — the common regime fits the smallest tier.
# ---------------------------------------------------------------------------

# tiering engages above this edge-table size; tests lower it to force the
# cond path on the CPU mesh (where it is otherwise skipped to keep suite
# compile times down — the oracle corr path is tier-agnostic either way)
TIER_MIN_EDGES = 4096
TIER_ON_CPU = False

# BA patch-table membership rule (see the note in update_op.tier_body).
# "okq_prefix" is shipped; "okq" (round-3 shipping) and "okv" (the
# round-3 regression) remain for the regression tests / bisect script
# (scripts/okv_bisect.py, tests/test_ba_table_membership.py).
_BA_TABLE_MODE = "okq_prefix"


def _run_tiered(n_edges, E_full, body, n_tiers=2):
    """body(n_rows) -> f(_) -> pytree with capacity-shaped leaves."""
    if (jax.default_backend() == "cpu" and not TIER_ON_CPU) or \
            E_full < TIER_MIN_EDGES or n_tiers <= 1:
        return body(E_full)(None)
    # the cond typically runs post-append (n_edges includes the newest
    # frame's ~2rM rows), so the tiers must cover steady-state live + one
    # frame of appends. Keyframe-heavy regimes (strong retirement) sit
    # near ~20% of the no-eviction capacity, the shipped configs' general
    # steady state near 40% — and the bench world's steady state PEAKS
    # just past the r4 25% boundary, which made long-run windows
    # oscillate between tiers. r5 first moved tier-0 to 30%, but the
    # MEASURED default-config steady state (retire-compacted 57216 live +
    # 9600 appends = 66816 at update time) sits 256 rows past the 30%
    # boundary (66560), silently running EVERY frame at the 40% tier
    # (124 vs ~105 ms/frame, r5 frame_profile). Tier-0 is now 33%
    # (73728): the post-append steady-state band fits with ~7k slack,
    # and sub-peak frames pay ~11% more O(E) work than a 30% tier would
    # — far cheaper than the 1.33x excursion. Every tier duplicates the
    # traced region; compile time is the price.
    fracs = {2: (40, 100), 3: (33, 45, 100)}.get(n_tiers, (40, 100))
    tiers = sorted({min((E_full * f // 100 + 1023) // 1024 * 1024, E_full)
                    for f in fracs})
    fn = body(tiers[-1])
    for t in reversed(tiers[:-1]):
        fn = (lambda t=t, nxt=fn:
              lambda _: jax.lax.cond(n_edges <= t, body(t), nxt,
                                     operand=None))()
    return fn(None)


# ---------------------------------------------------------------------------
# the optimization inner loop
# ---------------------------------------------------------------------------

def update_op(cfg, params, state: SLAMState, t0, lam=None):
    """One update: network + 2 Gauss-Newton iterations.

    Mirrors `DPVO.update` (`dpvo/dpvo.py:711-749`). t0 is the first free
    pose (1 during bootstrap, n - OPTIMIZATION_WINDOW when initialized).
    lam: optional override of the depth damping (default the reference's
    1e-4, `dpvo/dpvo.py:722`) — the bootstrap passes a decaying schedule
    (see `DPVO.__call__`), steady-state tracking the reference constant.
    """
    M = cfg.PATCHES_PER_FRAME
    n = state.n_frames
    m_base = jnp.maximum(n - (cfg.patch_window_frames - 1), 0) * M

    ba_cfg = BAConfig(window=cfg.ba_window, patch_slots=cfg.patch_slots,
                      iterations=2,
                      per_patch_cap=2 * cfg.PATCH_LIFETIME + 2,
                      depth_step_clamp=(
                          getattr(cfg, "DEPTH_STEP_CLAMP", 1.0) or None))

    def tier_body(n_rows):
        """Network update + BA over the first n_rows edge-table rows.

        The edge table is prefix-compacted (retire_and_compact) and
        append_edges extends the prefix, so rows beyond state.n_edges are
        dead; running the whole O(E) region — reprojection, correlation,
        update operator, Jacobians, Hessian assembly — on a prefix tier
        cuts its cost proportionally. Outputs are padded back to capacity
        (dead rows carry zero weight, so their target/net values are
        inert)."""
        def f(_):
            sl = slice(None, n_rows)
            kk_sl, valid_sl = state.kk[sl], state.valid[sl]
            # ONE argsort per update (inside _group_by_patch): the BA
            # patch table is the only sorted structure; the neighbor
            # links derive from it (neighbors_from_table) and the frame
            # bucketing is counting-based. TPU argsorts cost ~6 ms at
            # the 88k tier (scripts/sort_micro.py, ba_micro2.py).
            q = kk_sl - m_base
            okq = (q >= 0) & (q < cfg.patch_slots)
            okv = valid_sl & okq
            # BA patch-table membership — the r3 okq/okv anomaly, root-
            # caused in r4 and CLOSED OUT in r5 with a reference-parity
            # proof (tests/test_ba_table_membership.py):
            #
            #   * Zero-weight (dead) member rows are provably inert in
            #     `_gn_iteration`: the okv table and the capless dense
            #     one-hot path produce the same solves. There is no
            #     latent masking bug.
            #   * The modes differ in WHICH LIVE EDGES fit the cap-sized
            #     table. Under okq, dead append rows alias real patch
            #     slots and crowd the per-patch cap, pushing each patch's
            #     newest (largest-baseline) live edges out of the depth/
            #     coupling blocks C/Em/u while they remain in the pose
            #     blocks B/v.
            #   * The CONSISTENT system (okv — the reference's atomicAdd
            #     semantics) undergoes a genuine Gauss-Newton inverse-
            #     depth collapse during the 12-iteration bootstrap under
            #     uniform (oracle) edge weights. r5 PROVED this is
            #     reference-faithful: the reference's own python BA
            #     (`dpvo/ba.py:86`), run on bootstrap inputs captured
            #     from this pipeline, collapses identically (median
            #     depth / floor fraction / pose norms agree to 3
            #     decimals with our dense solver). Five principled
            #     dampings (bootstrap lambda schedule, additive depth
            #     trust region, scale-gauge renormalization, log-space
            #     ratio-clamped retraction, C-relative floors) were each
            #     tested on the captured inputs; none rescues okv —
            #     the depth signal itself is persistently wrong under
            #     uniform weights in this regime.
            #
            # Shipped: "okq_prefix" = okq restricted to real table rows
            # (< n_edges) — a deliberate, understood improvement over
            # reference semantics, not an accident: during bootstrap
            # each patch's depth block integrates its earliest (small-
            # baseline) edges first while the pose blocks see every
            # edge, a graduated-optimization effect that makes the
            # oracle bootstrap exact (ATE ~0 at realistic FOV) where
            # the reference's consistent system diverges. The stale-
            # tail exclusion (rows beyond n_edges) keeps membership
            # deterministic in steady state.
            nbr = None
            order = None
            agg_order = None
            if _BA_TABLE_MODE == "okv":
                order = jnp.argsort(
                    jnp.where(okv, kk_sl, jnp.int32(1 << 30)), stable=True)
                table = _group_by_patch(q, okv, cfg.patch_slots,
                                        ba_cfg.per_patch_cap, order=order)
            elif _BA_TABLE_MODE == "okq_prefix":
                okp = okq & (jnp.arange(n_rows) < state.n_edges)
                key = jnp.where(okp, q, jnp.int32(cfg.patch_slots))
                # r5 measured dead end: a 2-pass LSD counting radix
                # (128-bucket one-hot-cumsum ranks) ran 5.0 vs 2.3 ms at
                # 55k — the bare int32 argsort is NOT the 6.6 ms the r4
                # ledger billed to "_group_by_patch (sort)"; that number
                # includes the searchsorted + table gather around it.
                order_t = jnp.argsort(key, stable=True)
                table = _group_by_patch(q, okp, cfg.patch_slots,
                                        ba_cfg.per_patch_cap,
                                        order=order_t)
                # neighbor links from the SAME sort via a dead-skipping
                # scan — saves the second O(E log^2 E) argsort (~6 ms at
                # the 88k tier) with exact neighbors() semantics (a
                # table-derived variant that truncated at the cap
                # measured ATE 0.45 -> 0.67 on walk_s0 from bootstrap
                # link loss; do not revive it)
                nbr = neighbors_from_sorted(order_t, key[order_t],
                                            valid_sl[order_t],
                                            cfg.patch_slots)
                # same sort routes the kk-SoftAgg through the banded MXU
                # run-sum kernel (r5): valid rows of a patch are
                # contiguous under order_t and bounded by the per-patch
                # cap, so the 5-6 ms scatter becomes block matmuls
                if n_rows % 512 == 0 and jax.default_backend() != "cpu":
                    agg_order = order_t
            else:
                table = _group_by_patch(q, okq, cfg.patch_slots,
                                        ba_cfg.per_patch_cap)
            # NOTE: the table is NOT passed as kk_table — the SoftAgg
            # member-table formulation measured ~8 ms SLOWER than the
            # scatter path at tier occupancy on v5e (update_op 108 -> 117
            # ms, default config); it remains available for shapes where
            # gathers beat scatter-adds
            net2, delta, weight, coords = _run_update_net(
                cfg, params, state, state.net[sl], state.ii[sl],
                state.jj[sl], kk_sl, valid_sl, n, order=order, nbr=nbr,
                agg_order=agg_order)
            target = coords[:, P // 2, P // 2, :].astype(jnp.float32) + \
                delta.astype(jnp.float32)
            weight = weight.astype(jnp.float32) * \
                valid_sl[:, None]
            poses, patches = _bundle_adjust_impl(
                state.poses, state.patches, state.intrinsics[0], target,
                weight, 1e-4 if lam is None else lam,
                state.ii[sl], state.jj[sl], kk_sl,
                valid_sl, t0, n, m_base, ba_cfg,
                patches_est=state.patches_est, patch_table=table)
            pad = state.ii.shape[0] - n_rows
            return (jnp.pad(net2, ((0, pad), (0, 0))),
                    jnp.pad(target, ((0, pad), (0, 0))),
                    jnp.pad(weight, ((0, pad), (0, 0))),
                    poses, patches)
        return f

    net2, target, weight, poses, patches = _run_tiered(
        state.n_edges, state.ii.shape[0], tier_body,
        getattr(cfg, 'EDGE_TIERS', 2))

    # NOTE the reference refreshes the world-point cloud here every update
    # (`dpvo/dpvo.py:747-749`); points are only ever CONSUMED through
    # `DPVO.points_and_colors` (viz + terminate + PLY export), so the
    # rebuild computes them on demand there instead (`compute_points`) —
    # a full-capacity point_cloud every update measured ~5 ms/frame at
    # default config for data nothing reads in the steady-state loop.
    # `state.points` holds the last on-demand refresh (stale between
    # calls by design).
    return state._replace(net=net2, target=target, weight=weight,
                          poses=poses, patches=patches)


def compute_points(cfg, state: SLAMState):
    """World points for every patch slot (`dpvo/dpvo.py:747-749`),
    computed on demand for `DPVO.points_and_colors`."""
    M = cfg.PATCHES_PER_FRAME
    ix = jnp.arange(state.patches.shape[0], dtype=jnp.int32) // M
    pts = pops.point_cloud(state.poses, state.patches, state.intrinsics, ix)
    pc = pts[:, P // 2, P // 2, :]
    return pc[:, :3] / jnp.where(jnp.abs(pc[:, 3:]) > 1e-8, pc[:, 3:], 1.0)


def flow_metric(cfg, state: SLAMState, i, j):
    """Bidirectional mean flow magnitude between keyframes i and j over the
    live edges connecting them (`DPVO.motionmag`, `dpvo/dpvo.py:507-514`,
    with beta=0.5 as used by `keyframe`).

    Only edges between the two named frames matter (at most ~2M of the
    whole table), so the reprojection runs on a compacted [4M] buffer:
    the O(E) part is one mask + one cumsum + one scatter (measured
    8.2 -> ~1 ms at default-config tiers vs reprojecting every row)."""
    M = cfg.PATCHES_PER_FRAME
    B = 4 * M

    def body(n_rows):
        def f(_):
            sl = slice(None, n_rows)
            ii, jj, valid = state.ii[sl], state.jj[sl], state.valid[sl]
            m_fwd = (ii == i) & (jj == j) & valid
            m_rev = (ii == j) & (jj == i) & valid
            m = m_fwd | m_rev
            r = jnp.cumsum(m.astype(jnp.int32)) - 1
            pos = jnp.where(m & (r < B), r, B)
            buf = jnp.full((B + 1,), n_rows, jnp.int32).at[pos].set(
                jnp.arange(n_rows, dtype=jnp.int32), mode="drop")[:B]
            ok = buf < n_rows
            bc = jnp.clip(buf, 0, n_rows - 1)
            fm = pops.flow_mag(state.poses, state.patches,
                               state.intrinsics, ii[bc], jj[bc],
                               state.kk[sl][bc],
                               beta=0.5).mean(axis=(1, 2))

            def masked_mean(w):
                w = w.astype(jnp.float32)
                return jnp.sum(fm * w) / jnp.maximum(w.sum(), 1.0)

            return masked_mean(m_fwd[bc] & ok) + masked_mean(m_rev[bc] & ok)
        return f

    return _run_tiered(state.n_edges, state.ii.shape[0], body,
                       getattr(cfg, 'EDGE_TIERS', 2))


# ---------------------------------------------------------------------------
# keyframe eviction
# ---------------------------------------------------------------------------

def keyframe_shift(cfg, state: SLAMState, retire=True):
    """Evict keyframe k = n - KEYFRAME_INDEX: record its relative pose,
    drop its edges, renumber, and shift every buffer left by one
    (`dpvo/dpvo.py:611-645`).

    The shift only moves the KEYFRAME_INDEX - 1 newest frames (the evicted
    keyframe sits a fixed distance from the head), so each buffer update
    is a static-length contiguous slab copy (dynamic_slice out, then
    dynamic_update_slice one frame earlier) — the r5 profile measured the
    previous full-buffer index-map gathers at 13.9 ms/frame at default
    config (whole-capacity rows streamed + small-row gather overhead) for
    what is ~15 MB of actual slab movement.

    Returns (state', dP[7]) where dP = pose_k * pose_{k-1}^-1 is the delta
    the host records for trajectory completion.
    """
    M = cfg.PATCHES_PER_FRAME
    pmem = cfg.pmem
    KI = cfg.KEYFRAME_INDEX              # static
    n = state.n_frames
    k = n - KI

    dP = lie.se3_mul(state.poses[k], lie.se3_inv(state.poses[k - 1]))

    # drop edges touching k, then renumber indices above k
    valid = state.valid & ~((state.ii == k) | (state.jj == k))
    kk = jnp.where(state.ii > k, state.kk - M, state.kk)
    ii = jnp.where(state.ii > k, state.ii - 1, state.ii)
    jj = jnp.where(state.jj > k, state.jj - 1, state.jj)

    # frame-indexed buffers: rows [k .. n-2] <- [k+1 .. n-1] as ONE slab
    # (length KI - 1 frames, static; the slice materializes before the
    # overlapping write)
    def shift_rows(a, per_frame):
        slab = jax.lax.dynamic_slice_in_dim(
            a, (k + 1) * per_frame, (KI - 1) * per_frame, 0)
        return jax.lax.dynamic_update_slice_in_dim(a, slab, k * per_frame, 0)

    # ring buffers: slot (i % pmem) <- slot ((i+1) % pmem) for
    # i = k .. n-2 ascending (each source is read before iteration i+1
    # overwrites it; KI - 1 static iterations)
    def shift_ring(a, per_slot):
        for i in range(KI - 1):
            fi = k + i
            src = jnp.mod(fi + 1, pmem) * per_slot
            dst = jnp.mod(fi, pmem) * per_slot
            slab = jax.lax.dynamic_slice_in_dim(a, src, per_slot, 0)
            a = jax.lax.dynamic_update_slice_in_dim(a, slab, dst, 0)
        return a

    state = state._replace(
        poses=shift_rows(state.poses, 1),
        patches=shift_rows(state.patches, M),
        patches_est=shift_rows(state.patches_est, M),
        intrinsics=shift_rows(state.intrinsics, 1),
        colors=shift_rows(state.colors, 1),
        imap=shift_ring(state.imap, M),
        gmap=shift_ring(state.gmap, M),
        fmap1=shift_ring(state.fmap1, 1),
        fmap2=shift_ring(state.fmap2, 1),
        ii=ii, jj=jj, kk=kk, valid=valid,
        n_frames=n - 1,
    )
    if retire:
        state = retire_and_compact(cfg, state)
    return state, dP


# ---------------------------------------------------------------------------
# fully fused per-frame step: insert + track + ON-DEVICE keyframe decision
# ---------------------------------------------------------------------------
# A remote-attached TPU pays ~65 ms for every host<->device value fetch, so
# the steady-state loop must run without reading anything back: the keyframe
# threshold comparison (`dpvo/dpvo.py:612`) becomes a lax.cond, and the
# bookkeeping the host needs (removal flags, relative poses, NaN guards) is
# appended to a device-side log replayed once at terminate().

def keyframe_and_log(cfg, state: SLAMState):
    """Post-update tail of the fused frame step: flow metric -> on-device
    keyframe decision (lax.cond) -> event-log append -> retirement.
    Shared by `track_and_keyframe` and the multi-chip
    `parallel.infer_shard.sharded_frame_step`."""
    n = state.n_frames
    i = n - cfg.KEYFRAME_INDEX - 1
    j = n - cfg.KEYFRAME_INDEX + 1
    mm = flow_metric(cfg, state, i, j)

    def do_remove(st):
        st2, dP = keyframe_shift(cfg, st, retire=False)
        return st2, dP, jnp.float32(1.0)

    def no_remove(st):
        k = st.n_frames - cfg.KEYFRAME_INDEX
        nan_flag = jnp.any(jnp.isnan(st.poses[k])).astype(jnp.float32)
        ident = jnp.zeros((7,), jnp.float32).at[6].set(1.0)
        return st, ident, jnp.float32(0.0) + 0.0 * nan_flag

    remove = (mm / 2.0) < cfg.KEYFRAME_THRESH
    state, dP, removed = jax.lax.cond(remove, do_remove, no_remove, state)
    nan_flag = jnp.any(jnp.isnan(
        state.poses[jnp.maximum(state.n_frames - cfg.KEYFRAME_INDEX, 0)])
    ).astype(jnp.float32)

    entry = jnp.concatenate([removed[None], dP, mm[None], nan_flag[None]])
    state = state._replace(
        log=state.log.at[state.log_idx].set(entry),
        log_idx=state.log_idx + 1)
    return retire_and_compact(cfg, state)


def track_and_keyframe(cfg, params, state: SLAMState):
    state = append_edges(cfg, state)
    t0 = jnp.maximum(state.n_frames - cfg.OPTIMIZATION_WINDOW, 1)
    state = update_op(cfg, params, state, t0)
    return keyframe_and_log(cfg, state)


def frame_step(cfg, params, state: SLAMState, image, intrinsics, fac,
               key=None, depth=None, mask=None, desc_centers=None):
    """insert + track + keyframe, one dispatch, zero host fetches.

    key=None draws from state.rng on device (the steady-state default)."""
    state = insert_frame(cfg, params, state, image, intrinsics, key, fac,
                         None, depth=depth, mask=mask, initialized=True,
                         desc_centers=desc_centers)
    state = state._replace(n_frames=state.n_frames + 1)
    return track_and_keyframe(cfg, params, state)


def chunk_step(cfg, params, state: SLAMState, images, intrinsics, facs,
               depths=None, masks=None, desc_centers=None):
    """`frame_step` scanned over K stacked frames in ONE dispatch.

    Identical math to K single-frame dispatches (the scan body is
    frame_step itself); exists purely to amortize the per-execute host
    and relay-RTT overhead on remote-attached TPUs by cfg.PIPELINE_CHUNK.

    images: [K, H, W, 3]; intrinsics: [K, 4]; facs: [K];
    depths: [K, h, w] or None; masks: [K, h, w] bool or None.
    """
    xs = [images, intrinsics, facs]
    if depths is not None:
        xs.append(depths)
    if masks is not None:
        xs.append(masks)

    def body(st, x):
        img, intr, fac = x[0], x[1], x[2]
        dep = x[3] if depths is not None else None
        msk = x[-1] if masks is not None else None
        st = frame_step(cfg, params, st, img, intr, fac,
                        depth=dep, mask=msk, desc_centers=desc_centers)
        return st, None

    state, _ = jax.lax.scan(body, state, tuple(xs))
    return state


def track_step(cfg, params, state: SLAMState):
    """append factors -> update -> keyframe flow metric -> retire old edges.

    Returns (state', flow_metric_scalar). The host compares the scalar to
    KEYFRAME_THRESH and triggers `keyframe_shift` when the frame is too
    static (`dpvo/dpvo.py:605-612`).
    """
    state = append_edges(cfg, state)
    n = state.n_frames
    t0 = jnp.maximum(n - cfg.OPTIMIZATION_WINDOW, 1)
    state = update_op(cfg, params, state, t0)
    i = n - cfg.KEYFRAME_INDEX - 1
    j = n - cfg.KEYFRAME_INDEX + 1
    mm = flow_metric(cfg, state, i, j)
    state = retire_and_compact(cfg, state)
    return state, mm
