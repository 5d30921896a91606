"""Fixed-shape SLAM state (the patch graph) as a JAX pytree.

TPU-native redesign of the reference `PatchGraph` (`dpvo/patchgraph.py:13-62`)
plus DPVO's network ring buffers (`dpvo/dpvo.py:67-79`): every array has a
static shape sized from the config, counts are traced int32 scalars, and the
dynamic edge lists of the reference (concatenate/filter per frame,
`dpvo/dpvo.py:341-364`) become one fixed-capacity edge table with a validity
mask + periodic stable compaction. The whole state threads through jitted
step functions with donated buffers, so it lives permanently in HBM.

Layout notes (TPU-first):
  * feature maps are channel-last ([slot, H, W, C]) so channels ride VMEM
    lanes and the correlation kernel can tile them directly,
  * imap/gmap are flattened over (ring slot, patch) exactly like the
    reference's views (`dpvo/dpvo.py:124-130`) so edge gathers are one
    index op: row = kk % (M * pmem),
  * patch/pose buffers are indexed by absolute frame id (no ring) because
    BUFFER_SIZE bounds the whole run.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.vonet import DIM, FDIM, P, RES


class SLAMState(NamedTuple):
    # ---- per-frame (absolute index) -------------------------------------
    poses: jnp.ndarray          # [N, 7] w2c SE3, fp32
    patches: jnp.ndarray        # [N*M, 3, P, P] (x, y, inverse depth), fp32
    patches_est: jnp.ndarray    # [N*M, 3, P, P] depth-prior anchors, fp32
    intrinsics: jnp.ndarray     # [N, 4] fx fy cx cy at 1/RES scale, fp32
    colors: jnp.ndarray         # [N, M, 3] uint8 (RGB)
    points: jnp.ndarray         # [N*M, 3] world points, fp32

    # ---- network feature memory (ring of pmem slots) --------------------
    imap: jnp.ndarray           # [pmem*M, DIM]         context features
    gmap: jnp.ndarray           # [pmem*M, FDIM, P, P]  matching patches
    fmap1: jnp.ndarray          # [pmem, H4, W4, FDIM]  /4 feature maps
    fmap2: jnp.ndarray          # [pmem, H16, W16, FDIM] /16 feature maps

    # ---- edge table (fixed capacity, prefix-compacted) ------------------
    ii: jnp.ndarray             # [E] int32 source frame
    jj: jnp.ndarray             # [E] int32 target frame
    kk: jnp.ndarray             # [E] int32 global patch id
    valid: jnp.ndarray          # [E] bool
    net: jnp.ndarray            # [E, DIM] hidden state
    target: jnp.ndarray         # [E, 2] fp32 flow targets
    weight: jnp.ndarray         # [E, 2] fp32 confidences

    # ---- counters (traced scalars) --------------------------------------
    n_frames: jnp.ndarray       # int32, number of accepted keyframes
    n_edges: jnp.ndarray        # int32, used slots in the edge table

    # ---- per-frame event log (device-side; fetched once at terminate) ----
    # [LOG_CAP, 10]: (removed_flag, dP[7], flow_metric, nan_flag)
    # Avoids the ~65 ms host<->device round-trip per frame that a
    # host-side keyframe decision would cost on a remote-attached TPU.
    log: jnp.ndarray
    log_idx: jnp.ndarray        # int32

    # ---- per-frame global descriptors (loop closure, async mode) --------
    # [LOG_CAP, desc_dim] bf16, indexed like `log` (one row per tracked
    # input frame); the host drains them in chunks every LC interval
    # instead of fetching the feature map per frame. Allocated with dim 1
    # when loop closure is off.
    desc_log: jnp.ndarray

    # ---- device-resident PRNG key (patch selection / depth init) --------
    # Advanced inside insert_frame so the steady-state host loop does not
    # dispatch a jax.random.split per frame (an extra executable launch on
    # a relay-attached TPU).
    rng: jnp.ndarray            # [2] uint32


def init_state(cfg, ht, wd, feat_dtype=jnp.bfloat16, seed=0):
    """Allocate the full state for images of size (ht, wd)."""
    N = cfg.BUFFER_SIZE
    M = cfg.PATCHES_PER_FRAME
    E = cfg.edge_capacity
    pmem = cfg.pmem
    h4, w4 = ht // RES, wd // RES
    h16, w16 = h4 // 4, w4 // 4

    poses = jnp.zeros((N, 7), jnp.float32).at[:, 6].set(1.0)
    return SLAMState(
        poses=poses,
        patches=jnp.ones((N * M, 3, P, P), jnp.float32),
        patches_est=jnp.zeros((N * M, 3, P, P), jnp.float32),
        intrinsics=jnp.zeros((N, 4), jnp.float32),
        colors=jnp.zeros((N, M, 3), jnp.uint8),
        points=jnp.zeros((N * M, 3), jnp.float32),
        imap=jnp.zeros((pmem * M, DIM), feat_dtype),
        gmap=jnp.zeros((pmem * M, FDIM, P, P), feat_dtype),
        fmap1=jnp.zeros((pmem, h4, w4, FDIM), feat_dtype),
        fmap2=jnp.zeros((pmem, h16, w16, FDIM), feat_dtype),
        ii=jnp.zeros((E,), jnp.int32),
        jj=jnp.zeros((E,), jnp.int32),
        kk=jnp.zeros((E,), jnp.int32),
        valid=jnp.zeros((E,), bool),
        net=jnp.zeros((E, DIM), feat_dtype),
        target=jnp.zeros((E, 2), jnp.float32),
        weight=jnp.zeros((E, 2), jnp.float32),
        n_frames=jnp.asarray(0, jnp.int32),
        n_edges=jnp.asarray(0, jnp.int32),
        log=jnp.zeros((getattr(cfg, "LOG_CAP", 8192), 10), jnp.float32),
        log_idx=jnp.asarray(0, jnp.int32),
        desc_log=jnp.zeros(
            (getattr(cfg, "LOG_CAP", 8192) if cfg.loop_enabled else 1,
             getattr(cfg, "DESC_DIM", 2048) if cfg.loop_enabled else 1),
            jnp.bfloat16),
        rng=jax.random.PRNGKey(seed),
    )
