"""Configuration system (dataclass + YAML overlays + CLI merging).

Replaces the reference's yacs setup (`dpvo/config.py:3-37`,
`dpvo_configs/*.yaml`): same knob names and defaults so reference config
files load unchanged. Derived *static* capacities (edge buffer size, BA
window, segment bounds) are computed here once — they define the compiled
shapes of the jitted SLAM steps.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


@dataclass(frozen=True)
class DPVOConfig:
    # max number of keyframes (buffer capacity)
    BUFFER_SIZE: int = 2048
    # bias patch selection towards high gradient regions
    GRADIENT_BIAS: bool = True
    # VO config (increase for better accuracy)
    PATCHES_PER_FRAME: int = 80
    REMOVAL_WINDOW: int = 20
    OPTIMIZATION_WINDOW: int = 12
    PATCH_LIFETIME: int = 12
    # keyframe decision
    KEYFRAME_INDEX: int = 4
    KEYFRAME_THRESH: float = 12.5
    # camera motion model
    MOTION_MODEL: str = "DAMPED_LINEAR"
    MOTION_DAMPING: float = 0.5
    # warm-up frame-acceptance gate (`dpvo/dpvo.py:846-850` hard-codes 2.0
    # px of probed flow; <0 disables the gate entirely)
    MOTION_PROBE_THRESH: float = 2.0
    MIXED_PRECISION: bool = True
    # loop closure
    loop_enabled: bool = False
    LOOP_CLOSE_WINDOW_SIZE: int = 3
    LOOP_RETR_THRESH: float = 0.50
    # global bundle adjustment
    ENABLE_GLOBAL_BA: bool = False
    DISTANCE_THRESH: float = 3.0
    USE_DISTANCE_EDGES: bool = True

    # ---- TPU-rebuild specific knobs -------------------------------------
    # ring-buffer depth for feature memory (reference `self.pmem = 36`,
    # `dpvo/dpvo.py:58-60`; grows to BUFFER_SIZE when global BA is on)
    MEM: int = 36
    # edge-correlation chunk for the XLA fallback path
    CORR_CHUNK: int = 4096
    # use the Pallas TPU correlation kernel when available
    PALLAS_CORR: bool = True
    # Pallas kernel v2: fuse window extraction + bilinear blend into the
    # kernel (8x less kernel out-traffic; the XLA extraction passes and
    # their full correlation surfaces disappear). Off until A/B-timed on
    # hardware; numerics parity-tested either way (tests/test_pallas_corr).
    PALLAS_FUSED: bool = False
    # Pallas region geometry: "x32" = v1 (16-aligned 32-column regions,
    # phase-dependent 9-24 px spread bound), "x16" = v4 (exact-origin
    # 16-column regions via an in-kernel bitcast rotate: half the surface
    # and 15% faster at the default tiers, uniform 8 px spread bound)
    PALLAS_VARIANT: str = "x32"
    # x16 hybrid fallback: clipped edges (patch spread beyond the x16
    # region) are recomputed through the x32 geometry on this static edge
    # budget per update (0 = off). Only meaningful with
    # PALLAS_VARIANT="x16".
    PALLAS_HYBRID_BUDGET: int = 0
    # device-side per-frame event log capacity (>= total input frames)
    LOG_CAP: int = 8192
    # steady-state frames batched into one lax.scan dispatch (1 = dispatch
    # per frame). Identical math; amortizes the per-execute host + relay
    # RTT overhead on remote-attached TPUs. Adds (CHUNK-1) frames of
    # tracking latency, so keep 1 for live/interactive runs.
    PIPELINE_CHUNK: int = 1
    # async loop closure: global-descriptor dim (VLAD K*C) and how often
    # the host drains the device descriptor/event logs + attempts closures
    DESC_DIM: int = 2048
    LC_INTERVAL: int = 16
    # steady-state patch inverse-depth init: "random" (this reference
    # fork, `dpvo/dpvo.py:818`) or "median" (upstream DPVO: median of the
    # last 3 frames' patch depths — lower per-frame depth noise)
    DEPTH_INIT: str = "random"
    # patch-center policy: "random" (reference default), or "keypoints"
    # (Shi-Tomasi top-M, the SuperPoint-equivalent of `dpvo/net.py:112-117`)
    PATCH_SELECTOR: str = "random"
    # loop-retrieval backend: "vlad" (float dot-product database, NetVLAD-
    # equivalent) or "dbow" (native C++ binary inverted file, the
    # `retrieval_dbow.py` counterpart)
    RETRIEVAL_BACKEND: str = "vlad"
    # edge-prefix tier count for O(E) stages (1 disables the lax.cond
    # tiering; each tier duplicates the traced region -> compile time)
    EDGE_TIERS: int = 2
    # per-GN-iteration trust region on the inverse-depth step (r5); 0
    # disables (exact reference semantics). See
    # ba/gauss_newton.BAConfig.depth_step_clamp for the rationale.
    DEPTH_STEP_CLAMP: float = 1.0
    # initial depth damping for the 12-iteration bootstrap's geometric
    # lambda decay (0.35^k, floored at the reference's 1e-4); the default
    # equals the reference constant, i.e. no schedule
    BOOT_LAM0: float = 1e-4
    # path to an hloc NetVLAD torch checkpoint (VGG16+NetVLAD+whitening);
    # empty -> weight-free VLAD over VO features
    NETVLAD_CHECKPOINT: str = ""
    # retrieval ignores frames newer than this when querying (the
    # reference hard-codes SKIP_WINDOW=50, `retrieval_netvlad.py:26`)
    LOOP_SKIP_WINDOW: int = 50
    # minimum 3D-3D correspondences at every loop-verification gate (the
    # reference hard-codes 30 for full-res DISK+LightGlue keypoint counts,
    # `long_term.py:246-250`; scale down with small images)
    LOOP_MIN_INLIERS: int = 30
    # triangulation triplet (i-s, i, i+s); the reference hard-codes s=1
    # (`long_term.py:84-89`) — widen on slow sequences for baseline
    LOOP_KP_STRIDE: int = 1
    # max reprojection residual (px) for a triangulated loop keypoint (the
    # reference hard-codes 2.0, `long_term.py:134`; the achievable floor
    # scales with VO pose error and image resolution)
    LOOP_RESID_THRESH: float = 2.0
    # closure benefit gate (r5, beyond the reference): apply a verified
    # Sim(3) closure only when the implied correction exceeds this
    # fraction of the loop's camera path length (translation) or this
    # log-scale magnitude; smaller corrections mean the map already
    # agrees with the measurement and a rescale would only redistribute
    # error (the r4 soak measured net-harmful closures at good VO
    # quality). 0 disables (reference behavior: inlier count only,
    # `long_term.py:246-250`).
    LOOP_DRIFT_GATE: float = 0.02

    def merge_from_file(self, path):
        import yaml

        with open(path) as f:
            overrides = yaml.safe_load(f) or {}
        return self.merge_from_dict(overrides)

    def merge_from_dict(self, overrides):
        valid = {f.name for f in dataclasses.fields(self)}
        clean = {}
        for k, v in overrides.items():
            if k not in valid:
                raise KeyError(f"unknown config key: {k}")
            clean[k] = v
        return dataclasses.replace(self, **clean)

    def merge_from_list(self, opts):
        """yacs-style ["KEY", value, "KEY", value, ...] CLI overrides."""
        overrides = {}
        for k, v in zip(opts[::2], opts[1::2]):
            cur = getattr(self, k)  # raises on unknown key
            if isinstance(cur, bool):
                v = v in (True, "True", "true", "1", 1)
            elif isinstance(cur, int):
                v = int(v)
            elif isinstance(cur, float):
                v = float(v)
            overrides[k] = v
        return self.merge_from_dict(overrides)

    def dump(self):
        import yaml

        return yaml.safe_dump(dataclasses.asdict(self))

    # ---- derived static capacities --------------------------------------

    @property
    def pmem(self):
        return self.BUFFER_SIZE if self.ENABLE_GLOBAL_BA else self.MEM

    @property
    def edge_capacity(self):
        """Static edge-buffer size: simulated worst case (no keyframe drops)
        of the reference's edge lifecycle (`dpvo/dpvo.py:751-769` creation,
        `:657` removal by source age) plus one frame of appends."""
        M, r, w = self.PATCHES_PER_FRAME, self.PATCH_LIFETIME, \
            self.REMOVAL_WINDOW
        per_frame = []
        max_active = 0
        for n in range(1, 4 * (r + w)):
            forw = M * (min(n - 1, r - 1))           # older patches -> n-1
            back = M * min(r, n)                     # new patches -> past
            per_frame.append((n - 1, forw + back))   # newest source = n-1
            # drop whole source-frames older than n - w
            per_frame = [(s, c) for (s, c) in per_frame if s >= n - w]
            max_active = max(max_active, sum(c for _, c in per_frame))
        cap = max_active + M * (2 * r - 1)
        return ((cap + 1023) // 1024) * 1024

    @property
    def ba_window(self):
        # must also cover the full bootstrap window (t0=1 at n=warmup=10)
        return max(self.OPTIMIZATION_WINDOW + 2, 10)

    @property
    def patch_window_frames(self):
        """Frames whose patches can appear in live edges / BA."""
        return self.REMOVAL_WINDOW + 3

    @property
    def patch_slots(self):
        return self.patch_window_frames * self.PATCHES_PER_FRAME

    @property
    def frame_window(self):
        """Frames that can be touched by live edges (ii or jj)."""
        return self.REMOVAL_WINDOW + 3


def load_config(yaml_path=None, **overrides):
    cfg = DPVOConfig()
    if yaml_path:
        from .resources import resource_path
        cfg = cfg.merge_from_file(resource_path(yaml_path))
    if overrides:
        cfg = cfg.merge_from_dict(overrides)
    return cfg
