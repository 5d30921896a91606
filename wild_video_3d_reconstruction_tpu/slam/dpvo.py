"""DPVO: the host-side SLAM driver around the jitted step functions.

Equivalent of the reference `DPVO` class (`dpvo/dpvo.py:22-875`) with the
per-frame logic split host/device:

  device (jitted, state donated): frame insertion, motion probe, tracking
      (edges + update network + BA), keyframe eviction, edge retirement.
  host: timestamp bookkeeping, the keyframe threshold comparison, the
      delta-chain for dropped frames, warm-up gating, trajectory assembly.

Per frame the host pulls at most two scalars (probe metric / keyframe flow
magnitude) and, on eviction, one 7-vector — everything else stays in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models import convert, vonet
from ..ops import lie
from ..utils.config import DPVOConfig
from . import steps
from .state import SLAMState, init_state


class DPVO:
    WARMUP = 10  # frames before initialization (`dpvo/dpvo.py:82`)

    def __init__(self, cfg: DPVOConfig, network, ht, wd, seed=0, path=""):
        """network: param pytree, path to a torch .pth checkpoint, or None
        for random initialization."""
        self.cfg = cfg
        self.ht, self.wd = ht, wd
        self.M = cfg.PATCHES_PER_FRAME
        self.path = path

        if isinstance(network, (str,)):
            self.params = convert.load_torch_checkpoint(network)
        elif network is None:
            self.params = vonet.init_vonet(jax.random.PRNGKey(0))
        else:
            self.params = network
        self.params = jax.tree.map(jnp.asarray, self.params)

        self.state: SLAMState = init_state(cfg, ht, wd)
        self.key = jax.random.PRNGKey(seed)

        self.is_initialized = False
        self.counter = 0          # input frames seen
        self.tlist = []           # input timestamps
        self.tstamps = np.zeros(cfg.BUFFER_SIZE, dtype=np.int64)
        self.delta = {}           # dropped frame -> (anchor tstamp, dP SE3)

        self._build_jits()

    # ------------------------------------------------------------------ jit
    def _build_jits(self):
        cfg = self.cfg

        def donate(fn, static=()):
            return jax.jit(fn, donate_argnums=(0,), static_argnums=static)

        self._insert = {}
        for has_depth in (False, True):
            for has_mask in (False, True):
                def fn(state, params, image, intr, key, fac, depth, mask,
                       initialized, _d=has_depth, _m=has_mask):
                    return steps.insert_frame(
                        cfg, params, state, image, intr, key, fac, None,
                        depth=depth if _d else None,
                        mask=mask if _m else None,
                        initialized=initialized)
                self._insert[(has_depth, has_mask)] = jax.jit(
                    fn, donate_argnums=(0,), static_argnums=(8,))

        self._probe = jax.jit(
            lambda state, params: steps.motion_probe(cfg, params, state))
        self._track = jax.jit(
            lambda state, params: steps.track_step(cfg, params, state),
            donate_argnums=(0,))
        self._update_only = jax.jit(
            lambda state, params, t0: steps.update_op(cfg, params, state, t0),
            donate_argnums=(0,))
        self._keyframe = jax.jit(
            lambda state: steps.keyframe_shift(cfg, state),
            donate_argnums=(0,))
        self._append = jax.jit(
            lambda state: steps.append_edges(cfg, state), donate_argnums=(0,))

    # ------------------------------------------------------------ properties
    @property
    def n(self):
        return int(self.state.n_frames)

    @property
    def m(self):
        return self.n * self.M

    @property
    def poses(self):
        return np.asarray(self.state.poses)

    # ---------------------------------------------------------------- frame
    def __call__(self, tstamp, image, depth=None, mask=None, intrinsics=None):
        """Track one frame. image: [H, W, 3] uint8 numpy (BGR);
        depth: [H, W] float metric depth or None; mask: [H, W] bool or None;
        intrinsics: [4] (fx, fy, cx, cy) full resolution."""
        if self.n + 1 >= self.cfg.BUFFER_SIZE:
            raise RuntimeError(
                "buffer full — increase cfg.BUFFER_SIZE (--buffer)")

        self.tlist.append(tstamp)
        self.tstamps[self.n] = self.counter

        # damped-linear timestamp ratio (`dpvo/dpvo.py:808-810`)
        *_, a, b, c = [1] * 3 + self.tlist
        fac = float(c - b) / max(float(b - a), 1e-6)

        self.key, sub = jax.random.split(self.key)
        insert = self._insert[(depth is not None, mask is not None)]
        zero_img = np.zeros((1, 1), np.float32)
        self.state = insert(
            self.state, self.params, jnp.asarray(image),
            jnp.asarray(np.asarray(intrinsics), dtype=jnp.float32), sub,
            jnp.float32(fac),
            jnp.asarray(depth if depth is not None else zero_img,
                        dtype=jnp.float32),
            jnp.asarray(mask if mask is not None else zero_img > 0),
            self.is_initialized)

        self.counter += 1

        if self.n > 0 and not self.is_initialized:
            if float(self._probe(self.state, self.params)) < 2.0:
                # not enough motion: park the frame behind an identity delta
                self.delta[self.counter - 1] = (self.counter - 2,
                                                np.asarray(lie.se3_identity(())))
                return

        # accept the frame
        self.state = self.state._replace(n_frames=self.state.n_frames + 1)

        if self.n == self.WARMUP and not self.is_initialized:
            self.is_initialized = True
            self.state = self._append(self.state)
            for _ in range(12):
                self.state = self._update_only(self.state, self.params,
                                               jnp.int32(1))
            self._retire()
        elif self.is_initialized:
            self.state, mm = self._track(self.state, self.params)
            if float(mm) / 2.0 < self.cfg.KEYFRAME_THRESH:
                k = self.n - self.cfg.KEYFRAME_INDEX
                t0 = int(self.tstamps[k - 1])
                t1 = int(self.tstamps[k])
                self.state, dP = self._keyframe(self.state)
                self.delta[t1] = (t0, np.asarray(dP))
                self.tstamps[k:self.n] = self.tstamps[k + 1:self.n + 1]
            else:
                pose_k = np.asarray(
                    self.state.poses[self.n - self.cfg.KEYFRAME_INDEX])
                if np.any(np.isnan(pose_k)):
                    raise FloatingPointError("estimated pose is NaN")
        else:
            # pre-initialization: accumulate factors only
            self.state = self._append(self.state)

    def _retire(self):
        self.state = jax.jit(
            lambda s: steps.retire_and_compact(self.cfg, s),
            donate_argnums=(0,))(self.state)

    # ------------------------------------------------------------- terminate
    def refine(self, iterations=12):
        """Final refinement updates (`dpvo_demo.py:120-121`)."""
        for _ in range(iterations):
            n = self.n
            t0 = jnp.int32(max(n - self.cfg.OPTIMIZATION_WINDOW, 1))
            self.state = self._update_only(self.state, self.params, t0)

    def get_pose(self, traj, t):
        if t in traj:
            return traj[t]
        t0, dP = self.delta[t]
        return np.asarray(lie.se3_mul(jnp.asarray(dP),
                                      jnp.asarray(self.get_pose(traj, t0))))

    def terminate(self):
        """Interpolate missing poses; returns (poses c2w [T, 7], tstamps).

        Mirrors `DPVO.terminate` (`dpvo/dpvo.py:282-303`).
        """
        poses_np = np.asarray(self.state.poses)
        traj = {int(self.tstamps[i]): poses_np[i] for i in range(self.n)}
        out = [self.get_pose(traj, t) for t in range(self.counter)]
        out = np.stack(out)
        out = np.asarray(lie.se3_inv(jnp.asarray(out)))   # w2c -> c2w
        return out, np.array(self.tlist, dtype=np.float64)

    def points_and_colors(self):
        """World points + RGB colors for the live map (`dpvo/dpvo.py:255-273`)."""
        m = self.m
        pts = np.asarray(self.state.points[:m])
        clr = np.asarray(self.state.colors).reshape(-1, 3)[:m]
        patches = np.asarray(self.state.patches[:m])
        d = patches[:, 2, 1, 1].reshape(self.n, self.M)
        med = np.median(d, axis=1, keepdims=True)
        sel = ((d > 1.0 * med) & (d < 4.0 * med)).reshape(-1)
        return pts[sel], clr[sel]
