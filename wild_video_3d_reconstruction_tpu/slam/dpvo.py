"""DPVO: the host-side SLAM driver around the jitted step functions.

Equivalent of the reference `DPVO` class (`dpvo/dpvo.py:22-875`) with the
per-frame logic split host/device for a *remote-attached* TPU, where every
host<->device value fetch costs ~65 ms:

  steady state: ONE jit dispatch per frame (`steps.frame_step`)
      -- encoders, patch selection, edge lifecycle, correlation, update
      operator, bundle adjustment, and the keyframe decision (lax.cond) all
      on device; per-frame bookkeeping (eviction flag, relative pose, NaN
      guard, flow metric) is appended to a device-side log.
  warm-up: the motion-probe gate (`dpvo/dpvo.py:846-850`) still syncs --
      it only runs for the first ~10 frames.
  terminate: one bulk fetch of state+log; the timestamp table and the
      dropped-frame delta chain are reconstructed by replaying the log.

A synchronous per-frame path (`sync_mode=True`) is kept for loop-closure
runs, which are host-orchestrated by nature.
"""

from __future__ import annotations

import time

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

    def __init__(self, cfg: DPVOConfig, network, ht, wd, seed=0, path="",
                 sync_mode=None):
        """network: param pytree, path to a torch .pth checkpoint, or None
        for random initialization."""
        self.cfg = cfg
        self.ht, self.wd = ht, wd
        self.M = cfg.PATCHES_PER_FRAME
        self.path = path
        # loop closure no longer forces per-frame host syncs: descriptors
        # are computed on device and drained every LC_INTERVAL frames
        self.sync_mode = False if sync_mode is None else sync_mode

        if isinstance(network, (str,)):
            self.params = convert.load_torch_checkpoint(network)
        elif network is None:
            self.params = vonet.init_vonet(jax.random.PRNGKey(0))
        else:
            self.params = network
        self.params = jax.tree.map(jnp.asarray, self.params)

        self.state: SLAMState = init_state(cfg, ht, wd, seed=seed)

        # cached device constants: avoid re-uploading the zero depth/mask
        # placeholders and (usually constant) intrinsics every frame
        self._zero_dep = jnp.zeros((1, 1), jnp.float32)
        self._zero_msk = self._zero_dep > 0
        _chunk = max(int(getattr(cfg, "PIPELINE_CHUNK", 1)), 1)
        self._zero_dep_chunk = jnp.zeros((_chunk, 1, 1), jnp.float32)
        self._zero_msk_chunk = self._zero_dep_chunk > 0
        self._intr_cache = (None, None)     # (bytes, device array)
        self._fac_cache = (None, None)      # (float, device scalar)

        self.is_initialized = False
        self.counter = 0          # input frames seen
        self.tlist = []           # input timestamps
        # wall-clock accumulators for the LC-mode bench decomposition
        # (seconds; bench.py --loop divides by frames and embeds them in
        # the JSON — VERDICT r4 #4)
        self.perf = {}
        self.n_host = 0           # accepted keyframes (exact pre-init only)
        self.parked = []          # counters parked pre-init
        self.tstamps = np.zeros(cfg.BUFFER_SIZE, dtype=np.int64)
        self.delta = {}           # dropped frame -> (anchor tstamp, dP)
        self.loop_closure = None  # optional LongTermLoopClosure

        # async loop-closure bookkeeping (descriptor/event log draining)
        self._desc_centers = None
        self._init_counter = None  # input counter at initialization
        self._events_dispatched = 0
        self._events_consumed = 0
        self._lc_pending = None    # (first_event, log_rows, desc_rows)
        self._lc_req_lo = 0
        self._lc_images = {}       # input counter -> image (awaiting replay)

        # steady-state dispatch chunking (cfg.PIPELINE_CHUNK frames per
        # lax.scan dispatch); pending = host-side rows awaiting a flush
        self._chunk_size = max(int(getattr(cfg, "PIPELINE_CHUNK", 1)), 1)
        self._pending = []          # [(img, intr_row, fac, dep, msk)]
        self._pending_sig = None    # (has_depth, has_mask) of pending rows

        self._build_jits()

    # ------------------------------------------------------------------ jit
    def _build_jits(self):
        cfg = self.cfg

        self._insert = {}
        for has_depth in (False, True):
            for has_mask in (False, True):
                def fn(state, params, image, intr, fac, depth, mask,
                       initialized, _d=has_depth, _m=has_mask):
                    return steps.insert_frame(
                        cfg, params, state, image, intr, None, fac, None,
                        depth=depth if _d else None,
                        mask=mask if _m else None,
                        initialized=initialized)
                # NOTE: no buffer donation — donated executions fault the
                # remote (axon-relayed) TPU worker; the extra state copy is
                # ~0.3 ms/frame of HBM traffic.
                self._insert[(has_depth, has_mask)] = jax.jit(
                    fn, static_argnums=(7,))

        self._frame = {}
        centers = self._desc_centers
        for has_depth in (False, True):
            for has_mask in (False, True):
                def ffn(state, params, image, intr, fac, depth, mask,
                        _d=has_depth, _m=has_mask):
                    return steps.frame_step(
                        cfg, params, state, image, intr, fac,
                        depth=depth if _d else None,
                        mask=mask if _m else None,
                        desc_centers=centers)
                self._frame[(has_depth, has_mask)] = jax.jit(ffn)

        self._chunk = {}
        if self._chunk_size > 1:
            for has_depth in (False, True):
                for has_mask in (False, True):
                    def cfn(state, params, images, intrs, facs, deps, msks,
                            _d=has_depth, _m=has_mask):
                        return steps.chunk_step(
                            cfg, params, state, images, intrs, facs,
                            depths=deps if _d else None,
                            masks=msks if _m else None,
                            desc_centers=centers)
                    self._chunk[(has_depth, has_mask)] = jax.jit(cfn)

        # chunked event/descriptor-log slicing for the async LC drain
        K = cfg.LC_INTERVAL

        def _slice_logs(log, desc_log, lo):
            import jax.lax as lax
            return (lax.dynamic_slice_in_dim(log, lo, K, 0),
                    lax.dynamic_slice_in_dim(desc_log, lo, K, 0))

        self._slice_logs = jax.jit(_slice_logs)

        self._probe = jax.jit(
            lambda state, params: steps.motion_probe(cfg, params, state))
        self._track = jax.jit(
            lambda state, params: steps.track_step(cfg, params, state))
        self._update_only = jax.jit(
            lambda state, params, t0, lam=jnp.float32(1e-4):
            steps.update_op(cfg, params, state, t0, lam=lam))

        def _refine(state, params):
            t0 = jnp.maximum(state.n_frames - cfg.OPTIMIZATION_WINDOW, 1)
            return steps.update_op(cfg, params, state, t0)

        self._refine_step = jax.jit(_refine)
        self._keyframe = jax.jit(lambda state: steps.keyframe_shift(cfg, state))
        self._append = jax.jit(lambda state: steps.append_edges(cfg, state))
        self._retire = jax.jit(
            lambda state: steps.retire_and_compact(cfg, state))

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
        if self.counter + 1 >= self.cfg.BUFFER_SIZE + len(self.delta):
            if self.n + 1 >= self.cfg.BUFFER_SIZE:
                raise RuntimeError(
                    "buffer full — increase cfg.BUFFER_SIZE (--buffer)")
        if (self._events_dispatched + len(self._pending) + 1
                >= getattr(self.cfg, "LOG_CAP", 8192)):
            # JAX clamps out-of-bounds scatters, which would silently
            # corrupt the last event-log row instead of failing loudly
            raise RuntimeError(
                "device event log full — increase cfg.LOG_CAP "
                f"(= {getattr(self.cfg, 'LOG_CAP', 8192)}) above the "
                "total input frame count")

        self.tlist.append(tstamp)

        # damped-linear timestamp ratio (`dpvo/dpvo.py:808-810`)
        *_, a, b, c = [1] * 3 + self.tlist
        fac = float(c - b) / max(float(b - a), 1e-6)
        intr_np = np.asarray(intrinsics, dtype=np.float32)
        sig = (depth is not None, mask is not None)

        if self.is_initialized and not self.sync_mode:
            # steady state: no host fetches; the PRNG key advances inside
            # frame_step (state.rng)
            if self._chunk_size > 1:
                # accumulate raw rows; one lax.scan dispatch (and one
                # stacked image upload) per PIPELINE_CHUNK frames
                if self._pending and self._pending_sig != sig:
                    self._flush_pending()
                self._pending_sig = sig
                self._pending.append((image, intr_np, fac, depth, mask))
                self.counter += 1
                if self.loop_closure is not None:
                    self._lc_images[self.counter - 1] = image
                if len(self._pending) >= self._chunk_size:
                    self._flush_pending()
            else:
                self._dispatch_one(image, intr_np, fac, depth, mask)
                self.counter += 1
                self._events_dispatched += 1
                if self.loop_closure is not None:
                    # keep device arrays as-is: np.asarray here would block
                    # on a device fetch in the hot loop; _replay_events
                    # converts off the hot path (batched per LC interval)
                    self._lc_images[self.counter - 1] = image
            if (self.loop_closure is not None
                    and self._events_dispatched - self._lc_req_lo
                    >= self.cfg.LC_INTERVAL):
                self._lc_sync()
            return

        # --- device conversions for the warm-up / synchronous path ------
        # regular streams repeat the same fac, so cache the device scalar
        # (a scalar upload costs ~0.7 ms through the relay tunnel)
        if fac != self._fac_cache[0]:
            self._fac_cache = (fac, jnp.float32(fac))
        fac_dev = self._fac_cache[1]
        dep = (self._zero_dep if depth is None
               else jnp.asarray(depth, dtype=jnp.float32))
        msk = self._zero_msk if mask is None else jnp.asarray(mask)
        img = jnp.asarray(image)
        ib = intr_np.tobytes()
        if ib != self._intr_cache[0]:
            self._intr_cache = (ib, jnp.asarray(intr_np))
        intr = self._intr_cache[1]

        # --- warm-up / synchronous path ---------------------------------
        self.state = self._insert[sig](
            self.state, self.params, img, intr, fac_dev,
            dep, msk, self.is_initialized)
        self.tstamps[self.n_host] = self.counter
        self.counter += 1

        thresh = getattr(self.cfg, "MOTION_PROBE_THRESH", 2.0)
        if self.n_host > 0 and not self.is_initialized and thresh >= 0:
            if float(self._probe(self.state, self.params)) < thresh:
                self.parked.append(self.counter - 1)
                self.delta[self.counter - 1] = (
                    self.counter - 2, np.asarray(lie.se3_identity(())))
                return

        # accept the frame
        self.state = self.state._replace(n_frames=self.state.n_frames + 1)
        self.n_host += 1

        if self.loop_closure is not None:
            self.loop_closure(np.asarray(image), self.n_host - 1,
                              self.counter - 1)

        if not self.is_initialized:
            # Append forward+backward factors for EVERY accepted warm-up
            # frame, exactly like the reference (`dpvo/dpvo.py:855-856`
            # runs before the warm-up check). r5 root cause: the rebuild
            # previously appended only ONCE at initialization, so the
            # 12-iteration bootstrap optimized a STAR graph around the
            # warm-up frame — a topology on which Gauss-Newton's depth
            # block is genuinely ill-conditioned (verified: the
            # reference's own python BA collapses depths on the star
            # graph and is healthy on the full graph; the okq_prefix
            # cap-crowding "accidental regularizer" of r3/r4 was
            # compensating for the wrong graph, not for a BA defect).
            self.state = self._append(self.state)

        if self.n_host == self.WARMUP and not self.is_initialized:
            self.is_initialized = True
            self._init_counter = self.counter
            # optional bootstrap depth-damping schedule (BOOT_LAM0 > the
            # reference's 1e-4 enables a geometric lambda decay; with the
            # reference-faithful full warm-up graph the default constant
            # 1e-4 is healthy, so the schedule ships OFF)
            lam0 = float(getattr(self.cfg, "BOOT_LAM0", 1e-4))
            for it in range(12):
                lam = max(lam0 * (0.35 ** it), 1e-4)
                self.state = self._update_only(self.state, self.params,
                                               jnp.int32(1),
                                               jnp.float32(lam))
            self.state = self._retire(self.state)
        elif self.is_initialized:
            # synchronous tracked frame (loop-closure mode)
            self.state, mm = self._track(self.state, self.params)
            if float(mm) / 2.0 < self.cfg.KEYFRAME_THRESH:
                k = self.n_host - self.cfg.KEYFRAME_INDEX
                t0 = int(self.tstamps[k - 1])
                t1 = int(self.tstamps[k])
                self.state, dP = self._keyframe(self.state)
                self.delta[t1] = (t0, np.asarray(dP))
                self.tstamps[k:self.n_host] = self.tstamps[k + 1:
                                                           self.n_host + 1]
                self.n_host -= 1
                if self.loop_closure is not None:
                    self.loop_closure.keyframe(k)
            else:
                pose_k = np.asarray(
                    self.state.poses[self.n_host - self.cfg.KEYFRAME_INDEX])
                if np.any(np.isnan(pose_k)):
                    raise FloatingPointError("estimated pose is NaN")
        else:
            # pre-initialization: accumulate factors only
            self.state = self._append(self.state)

        if self.loop_closure is not None and self.is_initialized:
            self.loop_closure.attempt_loop_closure(self.n_host)

    # ------------------------------------------------- chunked dispatching
    def _dispatch_one(self, image, intr_np, fac, depth, mask):
        """One steady-state frame_step dispatch (conversions + caches)."""
        sig = (depth is not None, mask is not None)
        if fac != self._fac_cache[0]:
            self._fac_cache = (fac, jnp.float32(fac))
        dep = (self._zero_dep if depth is None
               else jnp.asarray(depth, dtype=jnp.float32))
        msk = self._zero_msk if mask is None else jnp.asarray(mask)
        img = jnp.asarray(image)
        ib = intr_np.tobytes()
        if ib != self._intr_cache[0]:
            self._intr_cache = (ib, jnp.asarray(intr_np))
        self.state = self._frame[sig](
            self.state, self.params, img, self._intr_cache[1],
            self._fac_cache[1], dep, msk)

    def _flush_pending(self):
        """Dispatch the accumulated chunk. A full chunk goes through the
        compiled K-frame scan; a partial tail (terminate / signature
        change) reuses the single-frame program instead of compiling a
        second scan shape."""
        rows, self._pending = self._pending, []
        if not rows:
            return
        _t0 = time.perf_counter()
        K = len(rows)
        sig = self._pending_sig
        if K != self._chunk_size:
            for image, intr_np, fac, depth, mask in rows:
                self._dispatch_one(image, intr_np, fac, depth, mask)
                self._events_dispatched += 1
            return
        imgs = [r[0] for r in rows]
        if all(isinstance(i, np.ndarray) for i in imgs):
            images = jax.device_put(np.stack(imgs))   # one transfer
        else:
            images = jnp.stack([jnp.asarray(i) for i in imgs])
        # regular streams repeat identical intrinsics/fac rows every
        # chunk; cache the device arrays (each upload costs ~an RTT
        # through a relay tunnel)
        intrs_np = np.stack([r[1] for r in rows])
        facs_np = np.asarray([r[2] for r in rows], np.float32)
        key = (intrs_np.tobytes(), facs_np.tobytes())
        cached = getattr(self, "_chunk_const_cache", (None, None, None))
        if cached[0] == key:
            intrs, facs = cached[1], cached[2]
        else:
            intrs = jnp.asarray(intrs_np)
            facs = jnp.asarray(facs_np)
            self._chunk_const_cache = (key, intrs, facs)
        if sig[0]:
            deps = jnp.stack([jnp.asarray(r[3], jnp.float32) for r in rows])
        else:
            deps = self._zero_dep_chunk
        if sig[1]:
            msks = jnp.stack([jnp.asarray(r[4]) for r in rows])
        else:
            msks = self._zero_msk_chunk
        self.state = self._chunk[sig](
            self.state, self.params, images, intrs, facs, deps, msks)
        self._events_dispatched += K
        self.perf["dispatch_stage"] = \
            self.perf.get("dispatch_stage", 0.0) + \
            (time.perf_counter() - _t0)

    # ---------------------------------------------------- log-based replay
    def enable_descriptors(self, vlad):
        """Attach VLAD centers so frame_step logs a global descriptor per
        tracked frame (called by LongTermLoopClosure in async mode)."""
        self._desc_centers = jnp.asarray(vlad.centers)
        if self.state.desc_log.shape[1] != vlad.dim:
            # state was allocated without loop closure — grow the log
            self.state = self.state._replace(desc_log=jnp.zeros(
                (self.cfg.LOG_CAP, vlad.dim), jnp.bfloat16))
        self._build_jits()

    def _replay_events(self, rows, descs, first_event):
        """Replay device log rows (events [first_event, first_event+len))
        into host bookkeeping — timestamps, eviction delta chain, NaN
        warnings — and feed the loop-closure callbacks in the exact order
        the sync path would have produced."""
        lc = self.loop_closure if not self.sync_mode else None
        n = self.n_host
        for e in range(rows.shape[0]):
            c = self._init_counter + first_event + e
            self.tstamps[n] = c
            n += 1
            if lc is not None:
                _ti = time.perf_counter()
                img = self._lc_images.pop(c, None)
                if img is not None and not isinstance(img, np.ndarray):
                    img = np.asarray(img)     # deferred device fetch
                _tf = time.perf_counter()
                self.perf["lc_img_fetch"] = \
                    self.perf.get("lc_img_fetch", 0.0) + (_tf - _ti)
                lc.add_descriptor(n - 1, np.asarray(descs[e], np.float32),
                                  img)
                self.perf["lc_desc_add"] = \
                    self.perf.get("lc_desc_add", 0.0) + \
                    (time.perf_counter() - _tf)
            removed, dP, nan_flag = rows[e, 0], rows[e, 1:8], rows[e, 9]
            if removed > 0.5:
                k = n - self.cfg.KEYFRAME_INDEX
                t0, t1 = int(self.tstamps[k - 1]), int(self.tstamps[k])
                self.delta[t1] = (t0, dP.astype(np.float32))
                self.tstamps[k:n - 1] = self.tstamps[k + 1:n].copy()
                n -= 1
                if lc is not None:
                    _tk = time.perf_counter()
                    lc.keyframe(k)
                    self.perf["lc_evict"] = \
                        self.perf.get("lc_evict", 0.0) + \
                        (time.perf_counter() - _tk)
            if nan_flag > 0.5:
                print(f"WARNING: NaN pose detected near input frame {c}")
        self.n_host = n
        self._events_consumed = first_event + rows.shape[0]

    def _lc_sync(self):
        """Pipelined drain of the device event/descriptor logs: request an
        async device->host copy of the newest LC_INTERVAL rows, consume the
        copy requested one interval ago (long since materialized), then
        attempt loop closures. One non-blocking transfer per interval
        replaces the reference's per-frame retrieval round trips."""
        t0 = time.perf_counter()
        lo = self._lc_req_lo
        log_rows, desc_rows = self._slice_logs(
            self.state.log, self.state.desc_log, jnp.int32(lo))
        for a in (log_rows, desc_rows):
            try:
                a.copy_to_host_async()
            except Exception:       # older jax / non-addressable arrays
                pass
        # pipeline the interval's IMAGES the same way: demo-path frames
        # arrive device-staged (Prefetcher device_upload=True), and a
        # blocking device->host fetch at replay time costs ~80 ms/frame
        # through the relay (measured r5 — this was the entire r4
        # "LC-mode bench gap"). Requesting the async copy one interval
        # ahead hides the transfer under device compute.
        if self._init_counter is not None:
            for e in range(self.cfg.LC_INTERVAL):
                img = self._lc_images.get(self._init_counter + lo + e)
                if img is not None and not isinstance(img, np.ndarray):
                    try:
                        img.copy_to_host_async()
                    except Exception:
                        pass
        prev = self._lc_pending
        self._lc_pending = (lo, log_rows, desc_rows)
        self._lc_req_lo = lo + self.cfg.LC_INTERVAL
        t1 = time.perf_counter()
        self.perf["lc_slice_dispatch"] = \
            self.perf.get("lc_slice_dispatch", 0.0) + (t1 - t0)

        if prev is not None:
            plo, prows, pdescs = prev
            prows, pdescs = np.asarray(prows), np.asarray(pdescs)
            t2 = time.perf_counter()
            self.perf["lc_log_fetch"] = \
                self.perf.get("lc_log_fetch", 0.0) + (t2 - t1)
            self._replay_events(prows, pdescs, plo)
            t3 = time.perf_counter()
            self.perf["lc_replay_ingest"] = \
                self.perf.get("lc_replay_ingest", 0.0) + (t3 - t2)
            if self.loop_closure is not None:
                self.loop_closure.attempt_loop_closure(self.n_host)
                self.perf["lc_attempt"] = \
                    self.perf.get("lc_attempt", 0.0) + \
                    (time.perf_counter() - t3)

    def _lc_flush(self):
        """Consume the in-flight chunk and any unrequested tail (terminate
        path)."""
        if self._lc_pending is not None:
            plo, prows, pdescs = self._lc_pending
            self._lc_pending = None
            self._replay_events(np.asarray(prows), np.asarray(pdescs), plo)
        total = int(self.state.log_idx)
        if total > self._events_consumed:
            lo = self._events_consumed
            rows = np.asarray(self.state.log[lo:total])
            descs = np.asarray(self.state.desc_log[lo:total]) \
                if self._desc_centers is not None else np.zeros((total - lo,
                                                                 0))
            self._replay_events(rows, descs, lo)

    def _replay_log(self):
        """Rebuild tstamps/delta from the device event log (async mode)."""
        if self.sync_mode or getattr(self, "_replayed", False):
            return
        self._flush_pending()
        self._replayed = True
        if self._init_counter is None:      # never initialized
            return
        self._lc_flush()

    # ------------------------------------------------------------- terminate
    def refine(self, iterations=12):
        """Final refinement updates (`dpvo_demo.py:120-121`)."""
        self._flush_pending()
        for _ in range(iterations):
            self.state = self._refine_step(self.state, self.params)

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
        self._replay_log()          # async mode: drain events first so the
        if self.loop_closure is not None:   # final LC sees every keyframe
            self.loop_closure.terminate(self.n_host)
        if self.cfg.ENABLE_GLOBAL_BA:
            from .global_ba import run_global_ba
            run_global_ba(self.cfg, self)
        n = self.n_host
        poses_np = np.asarray(self.state.poses)
        traj = {int(self.tstamps[i]): poses_np[i] for i in range(n)}
        out = [self.get_pose(traj, t) for t in range(self.counter)]
        out = np.stack(out)
        out = np.asarray(lie.se3_inv(jnp.asarray(out)))   # w2c -> c2w
        return out, np.array(self.tlist, dtype=np.float64)

    def normalize(self):
        """Normalize map scale (mean inverse depth -> 1) and rebase the
        trajectory on the first pose (`PatchGraph.normalize`,
        `dpvo/patchgraph.py:68-79`); the dropped-frame delta chain is
        rescaled to stay consistent."""
        self._flush_pending()
        st = self.state
        n = self.n
        M = self.M
        patches = np.array(st.patches)
        poses = np.array(st.poses)
        s = float(np.mean(patches[:n * M, 2]))
        patches[:n * M, 2] /= s
        poses[:n, :3] *= s
        rebased = lie.se3_mul(jnp.asarray(poses[:n]),
                              jnp.broadcast_to(lie.se3_inv(
                                  jnp.asarray(poses[0])), (n, 7)))
        poses[:n] = np.asarray(rebased)
        self.state = st._replace(poses=jnp.asarray(poses),
                                 patches=jnp.asarray(patches))
        for t, (t0, dP) in list(self.delta.items()):
            dP2 = np.asarray(dP, np.float32).copy()
            dP2[:3] *= s
            self.delta[t] = (t0, dP2)

    def geo_consistency_check(self, query_frame, fixed_frame, thresh=4.0):
        """Inlier ratio of the live edges from `query_frame` into frames
        <= `fixed_frame` (`DPVO.geo_consistency_check`,
        `dpvo/dpvo.py:689-709`): fraction with small reprojection residual
        and in-bounds coordinates."""
        st = self.state
        ii = np.asarray(st.ii)
        jj = np.asarray(st.jj)
        valid = np.asarray(st.valid)
        coords = np.asarray(st.target)            # network targets
        from ..ops import projective as pops
        reproj = np.asarray(pops.transform(
            st.poses, st.patches, st.intrinsics, st.ii, st.jj, st.kk)
        )[:, 1, 1, :]
        m = valid & (ii == query_frame) & (jj <= fixed_frame)
        if m.sum() == 0:
            return query_frame, 0.0
        r = np.linalg.norm(reproj[m] - coords[m], axis=-1)
        intr = np.asarray(self.state.intrinsics[0])
        cx, cy = intr[2], intr[3]
        xb = (reproj[m, 0] > -cx) & (reproj[m, 0] < 3 * cx)
        yb = (reproj[m, 1] > -cy) & (reproj[m, 1] < 3 * cy)
        inlier_ratio = float(((r < thresh) & xb & yb).mean())
        return query_frame, inlier_ratio

    def save_inlier_ratio_record(self, path):
        """Write per-keyframe inlier ratios + a diagnostic plot
        (`dpvo/dpvo.py:179-205`)."""
        import os

        os.makedirs(path, exist_ok=True)
        n = self.n_host
        record = {}
        lo = max(n - self.cfg.OPTIMIZATION_WINDOW + 2, 1)
        for i in range(lo, n + 1):
            _, ratio = self.geo_consistency_check(i, i - 1)
            record[int(self.tstamps[min(i, n - 1)])] = ratio
        with open(f"{path}/inlier_ratio_record.txt", "w") as f:
            for k, v in record.items():
                f.write(f"{k} {v}\n")
        with open(f"{path}/time_stamp.txt", "w") as f:
            for i in range(n):
                f.write(f"{int(self.tstamps[i])}\n")
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            xs = list(record.keys())
            ys = list(record.values())
            plt.plot(xs, ys, label="inlier ratio")
            plt.xlabel("frame timestamp")
            plt.ylabel("inlier ratio")
            plt.savefig(f"{path}/inlier_ratio_record.png")
            plt.close()
        except Exception:
            pass
        return record

    def terminate_keyframe(self):
        """Keyframe-only trajectory (`DPVO.terminate_keyframe`,
        `dpvo/dpvo.py:305-324`): c2w poses + their input timestamps."""
        self._replay_log()
        if self.loop_closure is not None:
            self.loop_closure.terminate(self.n_host)
        n = self.n_host
        poses = np.asarray(self.state.poses[:n])
        poses = np.asarray(lie.se3_inv(jnp.asarray(poses)))
        return poses, self.tstamps[:n].astype(float)

    def debug_match_figure(self, key_idx, query_num=3, save_path=None):
        """Reprojection match visualization between keyframe `key_idx` and
        its predecessors (`DPVO.draw_img_matching_coord`,
        `dpvo/dpvo.py:516-547`), drawn from live patch-graph state."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from ..ops import projective as pops

        st = self.state
        coords = np.asarray(pops.transform(
            st.poses, st.patches, st.intrinsics, st.ii, st.jj, st.kk))
        ii = np.asarray(st.ii)
        jj = np.asarray(st.jj)
        valid = np.asarray(st.valid)
        M = self.M
        key_xy = np.asarray(
            st.patches[key_idx * M:(key_idx + 1) * M, :2, 1, 1]) * 4

        fig, axes = plt.subplots(query_num, 1, figsize=(8, 3 * query_num))
        axes = np.atleast_1d(axes)
        for a, ax in enumerate(axes):
            tgt = key_idx - a - 1
            sel = valid & (ii == key_idx) & (jj == tgt)
            pts = coords[sel][:, 1, 1, :] * 4
            ax.scatter(key_xy[:, 0], key_xy[:, 1], c="red", s=8,
                       label="keyframe patches")
            ax.scatter(pts[:, 0], pts[:, 1], c="blue", s=8,
                       label=f"reprojected into kf {tgt}")
            ax.set_xlim(0, self.wd)
            ax.set_ylim(self.ht, 0)
            ax.legend(loc="upper right", fontsize=6)
        fig.tight_layout()
        if save_path:
            fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return fig

    def points_and_colors(self):
        """World points + RGB colors for the live map (`dpvo/dpvo.py:255-273`).

        Points are recomputed on demand (the steady-state loop no longer
        refreshes them every update — see `steps.update_op`), so the
        result reflects the CURRENT poses/depths including any loop-
        closure rescaling."""
        from .steps import compute_points
        if not hasattr(self, "_points_jit"):
            self._points_jit = jax.jit(
                lambda s: compute_points(self.cfg, s))
        self.state = self.state._replace(points=self._points_jit(self.state))
        m = self.m
        n = self.n
        pts = np.asarray(self.state.points[:m])
        clr = np.asarray(self.state.colors).reshape(-1, 3)[:m]
        patches = np.asarray(self.state.patches[:m])
        d = patches[:, 2, 1, 1].reshape(n, self.M)
        med = np.median(d, axis=1, keepdims=True)
        sel = ((d > 1.0 * med) & (d < 4.0 * med)).reshape(-1)
        return pts[sel], clr[sel]
