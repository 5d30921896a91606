"""Multi-chip inference sharding: edge-parallel correlation.

Parity with the reference needs one chip (SURVEY §2.1: the reference has
no multi-device parallelism), but the natural ICI scaling axis for the
tracking loop is the edge dimension — reprojection and the correlation
pyramid are embarrassingly parallel per edge while the feature maps are
small and replicable (SURVEY §5 "long-context" note). This module shards
that region with `shard_map` over a 1-D `edges` mesh axis:

  * poses/patches/feature pyramids: replicated (a few MB),
  * coords/kk/jj/valid: sharded on edges,
  * output correlation features: sharded on edges (the update operator
    can consume them sharded, or all-gather for the replicated SoftAgg).

Per-shard compute calls the same single-chip kernels (the Pallas kernel
on TPU, the XLA oracle elsewhere), so numerics are identical to the
unsharded path — proven by `tests/test_parallel.py`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def make_edge_mesh(n_devices=None):
    devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), ("edges",))


def sharded_patch_corr(mesh, gmap, pyramid, coords, kk, jj, valid,
                       radius=3, chunk=512, gather=True):
    """Edge-sharded correlation pyramid.

    Same contract as `ops.corr.patch_corr_pyramid` / the Pallas kernel;
    E must divide by the mesh size (pad with invalid rows otherwise).
    gather=False returns the result still sharded on edges.
    """
    from ..ops.corr import patch_corr_pyramid

    n = mesh.shape["edges"]
    E = coords.shape[0]
    assert E % n == 0, f"pad edges to a multiple of the mesh size ({n})"

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P("edges"), P("edges"), P("edges"),
                  P("edges")),
        out_specs=P(None) if gather else P("edges"),
        check_rep=False)
    def body(gmap_, f1, f2, coords_, kk_, jj_, valid_):
        out = patch_corr_pyramid(gmap_, (f1, f2), coords_, kk_, jj_,
                                 radius=radius, valid=valid_, chunk=chunk)
        if gather:
            out = jax.lax.all_gather(out, "edges", axis=0, tiled=True)
        return out

    return body(gmap, pyramid[0], pyramid[1], coords, kk, jj, valid)


# ---------------------------------------------------------------------------
# full tracked-frame update region, edges sharded over the mesh
# ---------------------------------------------------------------------------

def _psum_soft_agg(params, x, seg_ids, num_segments, valid, axis):
    """SoftAgg with the segment reductions distributed over `axis`.

    Matches `models.update._soft_agg`'s dense formulation numerically up to
    fp32 partial-sum reordering: the f/g/h projections and the per-edge
    exp/normalize run on the local shard; the per-segment denominators and
    weighted sums are psum'd partial one-hot matmuls (segments are bounded
    and small, so the [S, D] collectives ride ICI cheaply)."""
    from ..models.layers import linear

    f = linear(params["f"], x)
    g = linear(params["g"], x)
    g32 = g.astype(jnp.float32)
    onehot = ((seg_ids[:, None] == jnp.arange(num_segments)[None, :])
              & valid[:, None]).astype(jnp.float32)        # [E_loc, S]
    gmax = jnp.max(jnp.where(valid[:, None], g32, -jnp.inf), axis=0,
                   keepdims=True)
    gmax = jax.lax.pmax(gmax, axis)                       # global channel max
    gmax = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
    e = jnp.exp(g32 - gmax) * valid[:, None]
    denom = jax.lax.psum(
        jnp.dot(onehot.T, e, preferred_element_type=jnp.float32), axis)
    w = e / jnp.maximum(jnp.dot(onehot, denom,
                                preferred_element_type=jnp.float32), 1e-12)
    y_seg = jax.lax.psum(
        jnp.dot(onehot.T, f.astype(jnp.float32) * w,
                preferred_element_type=jnp.float32), axis)  # [S, D]
    y = jnp.dot(onehot, y_seg, preferred_element_type=jnp.float32)
    return linear(params["h"], y.astype(x.dtype))


def _update_forward_sharded(params, net, inp, corr, kk_seg, ij_seg,
                            nbr_ix, nbr_jx, valid, num_kk, num_ij, axis):
    """`models.update.update_forward` with the edge axis sharded over
    `axis`. Per-edge compute (corr encoder, GRU, heads — the MXU-heavy
    384x384 matmuls) stays local; the two cross-edge couplings become
    collectives:

      * temporal neighbor gathers (global edge indices): all_gather the
        hidden state, gather locally — production layout note: sharding
        edges by patch group (contiguous kk) makes these shard-local;
      * SoftAgg segment softmax: psum'd partial segment sums.
    """
    from ..models.layers import gradient_clip, layer_norm, linear
    from ..models.update import _corr_encoder, _gated_residual, _mlp2

    net = net + inp + _corr_encoder(params["corr"], corr)
    net = layer_norm(params["norm"], net, eps=1e-3)

    mask_ix = ((nbr_ix >= 0) & valid).astype(net.dtype)[:, None]
    mask_jx = ((nbr_jx >= 0) & valid).astype(net.dtype)[:, None]
    net_g = jax.lax.all_gather(net, axis, axis=0, tiled=True)
    net = net + _mlp2(params["c1"],
                      mask_ix * net_g[jnp.clip(nbr_ix, 0, None)])
    net_g = jax.lax.all_gather(net, axis, axis=0, tiled=True)
    net = net + _mlp2(params["c2"],
                      mask_jx * net_g[jnp.clip(nbr_jx, 0, None)])

    net = net + _psum_soft_agg(params["agg_kk"], net, kk_seg, num_kk,
                               valid, axis)
    net = net + _psum_soft_agg(params["agg_ij"], net, ij_seg, num_ij,
                               valid, axis)

    net = layer_norm(params["gru"]["0"], net, eps=1e-3)
    net = _gated_residual(params["gru"]["1"], net)
    net = layer_norm(params["gru"]["2"], net, eps=1e-3)
    net = _gated_residual(params["gru"]["3"], net)

    relu_net = jax.nn.relu(net)
    delta = gradient_clip(linear(params["d"]["1"], relu_net))
    weight = jax.nn.sigmoid(gradient_clip(linear(params["w"]["1"],
                                                 relu_net)))
    return net, delta.astype(jnp.float32), weight.astype(jnp.float32)


def sharded_update_op(mesh, cfg, params, state, t0):
    """The flagship tracked-frame update — reproject -> correlate ->
    update operator -> Gauss-Newton BA — with the EDGE dimension sharded
    over a 1-D `edges` mesh (`slam.steps.update_op`'s compute region).

    Feature maps, poses, and patches are replicated (a few MB); every
    O(E) stage runs on E/n local rows. Cross-edge couplings (SoftAgg
    softmax, neighbor messages, Hessian accumulation) become psum /
    all_gather collectives; the reduced [6W, 6W] system is solved
    replicated so poses and patches come back identical on every device.
    Numerics match the unsharded step to fp32 partial-sum tolerance —
    asserted by `__graft_entry__.dryrun_multichip` and
    `tests/test_parallel.py`.

    Returns (net', target, weight, poses', patches') with edge-shaped
    outputs gathered back to replicated capacity shape.
    """
    from ..ba.gauss_newton import BAConfig, _bundle_adjust_impl
    from ..models.vonet import DIM, P as PATCH_P
    from ..ops import projective as pops
    from ..ops.corr import patch_corr_pyramid
    from ..ops.segment import neighbors

    M = cfg.PATCHES_PER_FRAME
    pmem = cfg.pmem
    n_mesh = mesh.shape["edges"]
    E = state.ii.shape[0]
    assert E % n_mesh == 0, (E, n_mesh)
    n = state.n_frames
    m_base = jnp.maximum(n - (cfg.patch_window_frames - 1), 0) * M
    ba_cfg = BAConfig(window=cfg.ba_window, patch_slots=cfg.patch_slots,
                      iterations=2,
                      per_patch_cap=2 * cfg.PATCH_LIFETIME + 2,
                      depth_step_clamp=(
                          getattr(cfg, "DEPTH_STEP_CLAMP", 1.0) or None))
    FW = cfg.frame_window
    fd = jnp.bfloat16 if cfg.MIXED_PRECISION else jnp.float32

    # neighbor links are one global sort over the edge table — computed
    # replicated (tiny next to the sharded O(E * C) stages), consumed
    # sharded
    nbr_ix, nbr_jx = neighbors(state.kk, state.jj, valid=state.valid)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("edges"), P("edges"), P("edges"), P("edges"),
                  P("edges"), P("edges"), P("edges")),
        out_specs=(P("edges"), P("edges"), P("edges"), P(), P()),
        check_rep=False)
    def body(ii, jj, kk, valid, net, nix, njx):
        from ..ba.gauss_newton import _group_by_patch

        # BA patch table, shard-local with the same okq_prefix membership
        # as `slam.steps.update_op` (prefix = GLOBAL row < n_edges). The
        # per-patch cap applies per shard here (each shard truncates its
        # own members before the psum) — identical to the global table
        # whenever no patch overflows the cap, which holds for live
        # steady-state graphs (live-per-patch <= 2*lifetime + 1 < cap).
        # BOOTSTRAP caveat (ADVICE r4): during the 12-iteration bootstrap
        # the table can overflow and per-shard truncation then diverges
        # from the global row order — and r5 established that bootstrap
        # membership is genuinely load-bearing (see slam/steps.py
        # update_op's note: the consistent system collapses there,
        # reference-faithfully). The sharded path is therefore for
        # POST-INITIALIZATION states only (multi-chip serving starts
        # after init; `sharded_frame_step` equality with the unsharded
        # program is asserted on initialized states by dryrun_multichip).
        E_loc = kk.shape[0]
        gid = jax.lax.axis_index("edges") * E_loc + \
            jnp.arange(E_loc, dtype=jnp.int32)
        q = kk - m_base
        okp = (q >= 0) & (q < cfg.patch_slots) & (gid < state.n_edges)
        patch_table = _group_by_patch(q, okp, cfg.patch_slots,
                                      ba_cfg.per_patch_cap)
        coords = pops.transform(state.poses, state.patches,
                                state.intrinsics, ii, jj, kk)
        coords = jnp.where(valid[:, None, None, None], coords, 0.0)
        corr = patch_corr_pyramid(
            state.gmap, (state.fmap1, state.fmap2),
            coords.astype(jnp.float32),
            jnp.mod(kk, M * pmem), jnp.mod(jj, pmem),
            radius=3, valid=valid, chunk=cfg.CORR_CHUNK)
        ctx = state.imap[jnp.mod(kk, M * pmem)]

        kb = jnp.maximum(n - (FW - 1), 0) * M
        fb = jnp.maximum(n - (FW - 1), 0)
        kk_seg = jnp.clip(kk - kb, 0, cfg.patch_slots)
        kk_seg = jnp.where(valid, kk_seg, cfg.patch_slots)
        li = jnp.clip(ii - fb, 0, FW)
        lj = jnp.clip(jj - fb, 0, FW)
        ij_seg = jnp.where(valid, li * (FW + 1) + lj, (FW + 1) * (FW + 1))

        net2, delta, weight = _update_forward_sharded(
            params["update"], net.astype(fd), ctx.astype(fd),
            corr.astype(fd), kk_seg, ij_seg, nix, njx, valid,
            cfg.patch_slots + 1, (FW + 1) * (FW + 1) + 1, "edges")

        c = PATCH_P // 2
        target = coords[:, c, c, :].astype(jnp.float32) + \
            delta.astype(jnp.float32)
        weight = weight.astype(jnp.float32) * valid[:, None]

        poses, patches = _bundle_adjust_impl(
            state.poses, state.patches, state.intrinsics[0], target,
            weight, 1e-4, ii, jj, kk, valid, t0, n, m_base, ba_cfg,
            patches_est=state.patches_est, patch_table=patch_table,
            ar=lambda x: jax.lax.psum(x, "edges"))
        return net2, target, weight, poses, patches

    return body(state.ii, state.jj, state.kk, state.valid,
                state.net, nbr_ix, nbr_jx)


def sharded_frame_step(mesh, cfg, params, state, image, intrinsics, fac):
    """The COMPLETE fused per-frame program (`slam.steps.frame_step`) with
    the edge-parallel region sharded over a 1-D `edges` mesh — the piece a
    real multi-chip deployment runs (VERDICT r3 #6).

    Layout: the encoders + patch selection + buffer writes
    (`insert_frame`) and the edge append are replicated (they are O(frame),
    a few MB); the O(E) region — reprojection, correlation, update
    operator, BA — runs edge-sharded via `sharded_update_op`'s shard_map
    body; the keyframe flow metric, the on-device keyframe `lax.cond`,
    the event-log write, and edge retirement run replicated again (log
    writes land identically on every shard, which under jit means one
    logical write). Equality with the unsharded `frame_step` is asserted
    by `__graft_entry__.dryrun_multichip` check 4.
    """
    import jax.numpy as jnp  # noqa: F811

    from ..ops import projective as pops
    from ..slam import steps

    state = steps.insert_frame(cfg, params, state, image, intrinsics,
                               None, fac, None, initialized=True)
    state = state._replace(n_frames=state.n_frames + 1)
    state = steps.append_edges(cfg, state)
    n = state.n_frames
    t0 = jnp.maximum(n - cfg.OPTIMIZATION_WINDOW, 1)

    net2, target, weight, poses, patches = sharded_update_op(
        mesh, cfg, params, state, t0)

    # points are computed on demand (`steps.compute_points`), mirroring
    # the unsharded update_op's r5 change
    state = state._replace(net=net2, target=target, weight=weight,
                           poses=poses, patches=patches)
    return steps.keyframe_and_log(cfg, state)
