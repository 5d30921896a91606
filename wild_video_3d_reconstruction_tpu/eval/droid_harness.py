"""DROID-comparison evaluation driver over the dense backend.

Port of `evaluation/droid_eva_tum.py:16-136`, which drives the external
`droid_slam` package on the 9 TUM-fr1 scenes and reports Sim3-aligned ATE
medians over trials. The external package's learned RAFT flow network is
not reproducible here (no weights, zero egress); instead the driver
accepts a pluggable `flow_fn`, with two built-ins:

  - "lk": coarse-to-fine Lucas-Kanade flow seeded by the current
    reprojection (`ops.dense.projmap`) — a classical, weight-free dense
    front end so the full protocol runs end-to-end on real images;
  - "oracle": ground-truth reprojection flow (synthetic self-test used by
    `tests/test_dense.py`-style checks).

All dense compute (pyramids, LK iterations, dense BA, frame distance,
depth filtering) is jitted XLA; the per-frame loop stays fetch-light like
the sparse path.

Run:
  python -m wild_video_3d_reconstruction_tpu.eval.droid_harness tum \
      --datapath /data/TUM-RGBD [--trials 3] [--stride 2]
"""

from __future__ import annotations

import argparse
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import dense as dops
from ..ops import lie


# ---------------------------------------------------------------------------
# classical dense flow (Lucas-Kanade on a stride grid, reprojection-seeded)
# ---------------------------------------------------------------------------

def _gray(img):
    return (img.astype(jnp.float32) @ jnp.asarray([0.114, 0.587, 0.299]))


def _pyr(g, levels=3):
    out = [g]
    for _ in range(levels - 1):
        h, w = out[-1].shape
        out.append(out[-1].reshape(h // 2, 2, w // 2, 2).mean((1, 3)))
    return out


def _bilinear(im, x, y):
    h, w = im.shape
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    fx, fy = x - x0, y - y0
    v00 = im[y0, x0]
    v01 = im[y0, x0 + 1]
    v10 = im[y0 + 1, x0]
    v11 = im[y0 + 1, x0 + 1]
    return ((1 - fx) * (1 - fy) * v00 + fx * (1 - fy) * v01
            + (1 - fx) * fy * v10 + fx * fy * v11)


@partial(jax.jit, static_argnames=("iters",))
def lk_flow(g_i, g_j, x0, y0, flow_init, iters=6):
    """Per-point LK flow from image i to j on one pyramid level.

    g_i/g_j: [H, W] grayscale; x0/y0: [M] source coords; flow_init: [M, 2].
    Returns refined flow [M, 2]. 5x5 window, Gauss-Newton on brightness
    constancy — the classical analogue of one RAFT lookup+update.
    """
    win = jnp.arange(-2, 3, dtype=jnp.float32)
    wy, wx = jnp.meshgrid(win, win, indexing="ij")
    wx, wy = wx.reshape(-1), wy.reshape(-1)

    px = x0[:, None] + wx[None, :]
    py = y0[:, None] + wy[None, :]
    t = _bilinear(g_i, px.reshape(-1), py.reshape(-1)).reshape(px.shape)

    def step(flow, _):
        qx = px + flow[:, None, 0]
        qy = py + flow[:, None, 1]
        s = _bilinear(g_j, qx.reshape(-1), qy.reshape(-1)).reshape(qx.shape)
        gx = (_bilinear(g_j, (qx + 0.5).reshape(-1), qy.reshape(-1))
              - _bilinear(g_j, (qx - 0.5).reshape(-1), qy.reshape(-1))
              ).reshape(qx.shape)
        gy = (_bilinear(g_j, qx.reshape(-1), (qy + 0.5).reshape(-1))
              - _bilinear(g_j, qx.reshape(-1), (qy - 0.5).reshape(-1))
              ).reshape(qx.shape)
        r = s - t
        a11 = (gx * gx).sum(1) + 1e-3
        a12 = (gx * gy).sum(1)
        a22 = (gy * gy).sum(1) + 1e-3
        b1 = (gx * r).sum(1)
        b2 = (gy * r).sum(1)
        det = a11 * a22 - a12 * a12
        dx = (a22 * b1 - a12 * b2) / det
        dy = (a11 * b2 - a12 * b1) / det
        return flow - jnp.stack([dx, dy], -1), None

    flow, _ = jax.lax.scan(step, flow_init, None, length=iters)
    return flow


def lk_flow_pyramid(img_i, img_j, x0, y0, flow_init, levels=3):
    """Coarse-to-fine LK: returns flow [M, 2] at full resolution."""
    gi, gj = _pyr(_gray(img_i), levels), _pyr(_gray(img_j), levels)
    s = 2.0 ** (levels - 1)
    flow = flow_init / s
    for lvl in range(levels - 1, -1, -1):
        sc = 2.0 ** lvl
        flow = lk_flow(gi[lvl], gj[lvl], x0 / sc, y0 / sc, flow)
        if lvl:
            flow = flow * 2.0
    return flow


# ---------------------------------------------------------------------------
# correlation-lookup flow (the RAFT/DROID `corr_index` path)
# ---------------------------------------------------------------------------

class CorrFlow:
    """Flow provider over learned features + the `corr_index` lookup.

    Replaces the classical LK fallback with the reference's native lookup
    family (`src/correlation_kernels.cu:20-124`): encode both frames with
    the VONet matching encoder (1/4 resolution), build each grid point's
    correlation map against the whole target feature map (one MXU
    matmul), average-pool a pyramid, then refine the reprojection seed
    coarse-to-fine by quadratic-interpolated peak search through
    `ops.dense.corr_index` windows.
    """

    def __init__(self, params, gx, gy, radius=3, levels=3, iters=2):
        from ..models import vonet
        from ..ops import dense as dops2

        self.gx, self.gy = gx, gy
        self.radius = radius
        self.levels = levels
        self._cache = {}

        fs = 4.0                                       # feature stride

        @jax.jit
        def encode(img):
            return vonet.encode_frame(params, img, jnp.float32).fmap

        def box3(f):
            # 3x3 mean over the feature grid: patch-level aggregation
            # lifts the correlation SNR (random or learned features)
            s = jnp.pad(f, ((1, 1), (1, 1), (0, 0)))
            f = sum(s[dy:dy + f.shape[0], dx:dx + f.shape[1]]
                    for dy in range(3) for dx in range(3)) / 9.0
            # NCC conditioning: remove the map-wide common component and
            # normalize each cell — raw encoder activations share a large
            # DC term that flattens the correlation landscape
            f = f - jnp.mean(f, axis=(0, 1), keepdims=True)
            return f / jnp.maximum(
                jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-6)

        @jax.jit
        def flow(fmap_i, fmap_j, seed_xy):
            from ..ops.patchify import patchify
            fmap_i = box3(fmap_i)
            fmap_j = box3(fmap_j)
            M = gx.shape[0]
            pts = jnp.stack([gx, gy], -1) / fs          # feature scale
            f_pts = patchify(fmap_i, pts, 0)[:, :, 0, 0]   # [M, C]
            C = f_pts.shape[-1]
            h, w = fmap_j.shape[0], fmap_j.shape[1]
            vol = (f_pts @ fmap_j.reshape(-1, C).T /
                   jnp.sqrt(jnp.float32(C))).reshape(1, M, 1, h, w)
            pyr = dops2.corr_pyramid(vol, num_levels=levels)
            est = seed_xy / fs                          # [M, 2]
            rd = 2 * radius + 1
            dgrid = jnp.arange(rd, dtype=jnp.float32) - radius
            for lvl in range(levels - 1, -1, -1):
                v = pyr[lvl]
                for _ in range(iters):
                    c = (est / (2.0 ** lvl)).T.reshape(1, 2, M, 1)
                    win = dops2.corr_index(v, c, radius)[0, :, :, :, 0]
                    win = win.transpose(2, 0, 1)        # [M, i(x), j(y)]
                    flat = win.reshape(M, -1)
                    p = jnp.argmax(flat, axis=1)
                    px = (p // rd).astype(jnp.int32)    # x index
                    py = (p % rd).astype(jnp.int32)
                    # quadratic sub-cell refinement per axis
                    def q(vm1, v0, vp1):
                        den = vm1 - 2 * v0 + vp1
                        off = 0.5 * (vm1 - vp1) / jnp.where(
                            jnp.abs(den) > 1e-6, den, 1.0)
                        return jnp.clip(jnp.where(jnp.abs(den) > 1e-6,
                                                  off, 0.0), -0.5, 0.5)
                    em = jnp.arange(M)
                    pxc = jnp.clip(px, 1, rd - 2)
                    pyc = jnp.clip(py, 1, rd - 2)
                    sx = q(win[em, pxc - 1, py], win[em, pxc, py],
                           win[em, pxc + 1, py])
                    sy = q(win[em, px, pyc - 1], win[em, px, pyc],
                           win[em, px, pyc + 1])
                    dx = dgrid[px] + jnp.where(px == pxc, sx, 0.0)
                    dy = dgrid[py] + jnp.where(py == pyc, sy, 0.0)
                    # flat / out-of-reach windows have no discriminative
                    # peak; argmax would return cell 0 and drift (-r, -r)
                    ok = flat[em, p] > flat.mean(axis=1) + 1e-6
                    dx = jnp.where(ok, dx, 0.0)
                    dy = jnp.where(ok, dy, 0.0)
                    est = est + jnp.stack([dx, dy], -1) * (2.0 ** lvl)
            return (est - pts) * fs                     # full-res flow

        self._encode = encode
        self._flow = flow

    def _feat(self, img):
        key = id(img)
        if key not in self._cache:
            if len(self._cache) > 16:
                self._cache.clear()
            self._cache[key] = self._encode(jnp.asarray(img))
        return self._cache[key]

    def __call__(self, img_i, img_j, seed_xy):
        return self._flow(self._feat(img_i), self._feat(img_j), seed_xy)


# ---------------------------------------------------------------------------
# dense VO loop (DROID-style frontend over ops.dense)
# ---------------------------------------------------------------------------

class DenseVO:
    """Minimal dense visual odometry over the DROID backend ops.

    Keyframe policy and optimization windows follow the DROID frontend:
    accept a frame when `frame_distance` to the last keyframe exceeds
    `kf_thresh`; optimize a sliding window with `dense_ba` on flow targets
    from `flow_fn(img_i, img_j, reproj_seed)`.
    """

    def __init__(self, ht, wd, intrinsics, buffer=256, stride=8,
                 kf_thresh=2.4, window=6, flow_fn=None, flow="corr",
                 params=None):
        self.ht, self.wd = ht, wd
        self.stride = stride
        self.window = window
        self.kf_thresh = kf_thresh
        self.intr = jnp.asarray(intrinsics, jnp.float32)
        self.poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32),
                             (buffer, 1))
        self.disps = np.full((buffer, ht, wd), 0.5, np.float32)
        self.images = np.zeros((buffer, ht, wd, 3), np.uint8)
        self.tstamps = []
        self.n = 0

        ys = np.arange(stride // 2, ht, stride)
        xs = np.arange(stride // 2, wd, stride)
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        self.gx = jnp.asarray(gx.reshape(-1), jnp.float32)
        self.gy = jnp.asarray(gy.reshape(-1), jnp.float32)

        if flow_fn is not None:
            self.flow_fn = flow_fn
        elif flow == "corr":
            # learned-features path (`corr_index` lookup); random init
            # still correlates local structure usefully when no
            # checkpoint is available
            if params is None:
                from ..models.vonet import init_vonet
                params = init_vonet(jax.random.PRNGKey(0))
            self.flow_fn = CorrFlow(params, self.gx, self.gy)
        else:
            self.flow_fn = self._lk

    # -- flow provider -----------------------------------------------------
    def _lk(self, img_i, img_j, seed_xy):
        flow0 = seed_xy - jnp.stack([self.gx, self.gy], -1)
        return lk_flow_pyramid(jnp.asarray(img_i), jnp.asarray(img_j),
                               self.gx, self.gy, flow0)

    def _reproj_seed(self, i, j):
        coords, _ = dops.projmap(jnp.asarray(self.poses[:self.n]),
                                 jnp.asarray(self.disps[:self.n]),
                                 self.intr,
                                 jnp.asarray([i]), jnp.asarray([j]))
        c = coords[0]
        gx = self.gx.astype(jnp.int32)
        gy = self.gy.astype(jnp.int32)
        return jnp.stack([c[..., 0][gy, gx], c[..., 1][gy, gx]], -1)

    # -- per-frame ---------------------------------------------------------
    def __call__(self, tstamp, image):
        n = self.n
        if n == 0:
            self.images[0] = image
            self.tstamps.append(tstamp)
            self.n = 1
            return

        self.images[n] = image
        self.poses[n] = self.poses[n - 1]
        self.disps[n] = self.disps[n - 1]
        self.tstamps.append(tstamp)
        self.n = n + 1
        self._optimize()

        # DROID keyframe policy (frontend rm_keyframe): after tracking,
        # if the second-newest keyframe moved less than kf_thresh mean
        # flow from its successor, evict it (`frame_distance` semantics,
        # `droid_kernels.cu:518`)
        n = self.n
        if n >= 8:
            d = float(dops.frame_distance(
                jnp.asarray(self.poses[:n]), jnp.asarray(self.disps[:n]),
                self.intr, jnp.asarray([n - 3]), jnp.asarray([n - 2]))[0])
            if d < self.kf_thresh:
                k = n - 2
                for buf in (self.images, self.poses, self.disps):
                    buf[k:n - 1] = buf[k + 1:n]
                del self.tstamps[k]
                self.n = n - 1

    def _optimize(self, iters=2):
        n = self.n
        if n < 2:
            return
        t0 = max(n - self.window, 0)
        ii, jj = [], []
        for a in range(t0, n):
            for b in range(t0, n):
                if a != b and abs(a - b) <= 2:
                    ii.append(a)
                    jj.append(b)
        ii = jnp.asarray(ii, jnp.int32)
        jj = jnp.asarray(jj, jnp.int32)

        # flow targets on the stride grid -> dense target/weight fields
        E = len(ii)
        tgt = np.zeros((E, self.ht, self.wd, 2), np.float32)
        wgt = np.zeros((E, self.ht, self.wd, 2), np.float32)
        gx = np.asarray(self.gx).astype(int)
        gy = np.asarray(self.gy).astype(int)
        for e in range(E):
            i, j = int(ii[e]), int(jj[e])
            seed = self._reproj_seed(i, j)
            flow = self.flow_fn(self.images[i], self.images[j], seed)
            xy = np.asarray(jnp.stack([self.gx, self.gy], -1) + flow)
            tgt[e, gy, gx] = xy
            wgt[e, gy, gx] = 1.0

        poses, disps = dops.dense_ba(
            jnp.asarray(self.poses[:n]), jnp.asarray(self.disps[:n]),
            self.intr, jnp.asarray(tgt), jnp.asarray(wgt), ii, jj,
            t0=max(t0, 1), t1=n, stride=self.stride, iterations=iters)
        self.poses[:n] = np.asarray(poses)
        self.disps[:n] = np.asarray(disps)

    def terminate(self):
        """(poses c2w [n, 7], timestamps)."""
        w2c = jnp.asarray(self.poses[:self.n])
        c2w = np.asarray(lie.se3_inv(w2c))
        return c2w, np.asarray(self.tstamps, np.float64)


# ---------------------------------------------------------------------------
# TUM protocol (mirrors droid_eva_tum.py:16-136)
# ---------------------------------------------------------------------------

def run_tum(datapath, scenes=None, trials=1, stride=2, frames=None):
    from . import metrics
    from .harness import TUM_FR1_SCENES, tum_stream

    scenes = scenes or TUM_FR1_SCENES
    results = {}
    for scene in scenes:
        errs = []
        for _ in range(trials):
            vo = None
            for t, img, intr in tum_stream(f"{datapath}/{scene}",
                                           stride=stride):
                if vo is None:
                    vo = DenseVO(img.shape[0], img.shape[1], intr)
                vo(t, img)
                if frames and len(vo.tstamps) >= frames:
                    break
            poses, ts = vo.terminate()
            gt_p, gt_t = metrics.load_tum_groundtruth(
                f"{datapath}/{scene}/groundtruth.txt")
            errs.append(metrics.ate_rmse(poses, ts, gt_p, gt_t))
        results[scene] = float(np.median(errs))
        print(f"{scene}: ATE {results[scene]:.4f}")
    print("mean:", float(np.mean(list(results.values()))))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", choices=["tum"])
    ap.add_argument("--datapath", required=True)
    ap.add_argument("--trials", type=int, default=1)
    ap.add_argument("--stride", type=int, default=2)
    ap.add_argument("--frames", type=int, default=None)
    args = ap.parse_args()
    run_tum(args.datapath, trials=args.trials, stride=args.stride,
            frames=args.frames)


if __name__ == "__main__":
    main()
