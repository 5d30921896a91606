"""Training data pipeline (TartanAir-style RGB-D clips).

Numpy/cv2 re-implementation of the reference readers
(`dpvo/data_readers/{base,tartan,factory,augmentation}.py`):

  * flow-distance frame graph: pairwise mean optical flow from depth +
    relative pose over subsampled pixels (`base.py` build_frame_graph);
    clips are sampled by walking the graph within [fmin, fmax] flow,
    preferring forward-in-time frames (`base.py:98-139`),
  * TartanAir layout: image_left/*.png + depth_left/*.npy + pose_left.txt
    in NED order, remapped to (x, y, z, qx, qy, qz, qw) with translations
    divided by DEPTH_SCALE=5 (`tartan.py:57-105`),
  * photometric + spatial augmentation,
  * disparity normalization by 0.7 * 98th percentile with matching pose
    rescale (`base.py:165-167`),
  * batches shaped for `parallel.train_step` (host-side; the device mesh
    consumes them via the dp-sharded batch axis).

Poses here are camera-to-world in the dataset; the training graph wants
world-to-camera, so clips are inverted on output (matching the reference's
training convention where poses enter `pops.transform` as w2c).
"""

from __future__ import annotations

import glob
import os.path as osp
from dataclasses import dataclass, field

import cv2
import numpy as np

from ..ops import lie

TARTAN_TEST_SPLIT = ("mono_gt",)   # scene-name fragments held out


@dataclass
class SceneInfo:
    images: list
    depths: list
    poses: np.ndarray          # [N, 7] dataset convention (c2w)
    intrinsics: np.ndarray     # [N, 4]
    graph: dict = field(default_factory=dict)


def flow_distance_matrix(poses_c2w, depths, intrinsics, subsample=16,
                         max_frames=None, read_depth=None):
    """Mean flow magnitude between frame pairs from depth + relative pose.

    Approximates the reference's build_frame_graph: reprojects a subsampled
    depth grid of frame i into frame j and measures mean displacement.
    """
    import jax.numpy as jnp

    from ..ops import projective as pops

    n = len(depths) if max_frames is None else min(len(depths), max_frames)
    pts = []
    for i in range(n):
        d = read_depth(depths[i]) if read_depth else depths[i]
        d = d[::subsample, ::subsample]
        H, W = d.shape
        ys, xs = np.mgrid[:H, :W]
        pts.append(np.stack([xs.ravel() * subsample,
                             ys.ravel() * subsample,
                             1.0 / np.maximum(d.ravel(), 1e-3)], -1))
    pts = np.stack(pts)                      # [n, K, 3]

    w2c = np.asarray(lie.se3_inv(jnp.asarray(poses_c2w[:n], jnp.float32)))
    D = np.full((n, n), np.inf, np.float32)
    K = pts.shape[1]
    fx, fy, cx, cy = intrinsics[0][:4]
    for i in range(n):
        X = np.stack([(pts[i, :, 0] - cx) / fx, (pts[i, :, 1] - cy) / fy,
                      np.ones(K), pts[i, :, 2]], -1)
        for j in range(max(0, i - 12), min(n, i + 13)):
            if i == j:
                D[i, j] = 0
                continue
            Gij = np.asarray(lie.se3_mul(jnp.asarray(w2c[j]),
                                         lie.se3_inv(jnp.asarray(w2c[i]))))
            X1 = np.asarray(lie.se3_act4(jnp.asarray(Gij), jnp.asarray(
                X, jnp.float32)))
            z = np.maximum(X1[:, 2], 0.1)
            u = fx * X1[:, 0] / z + cx
            v = fy * X1[:, 1] / z + cy
            flow = np.sqrt((u - pts[i, :, 0]) ** 2 + (v - pts[i, :, 1]) ** 2)
            D[i, j] = float(np.mean(np.minimum(flow, 250.0)))
    return D


class TartanAirDataset:
    DEPTH_SCALE = 5.0

    def __init__(self, root, n_frames=8, fmin=16.0, fmax=96.0,
                 image_size=(384, 512), aug=True, max_scenes=None):
        self.root = root
        self.n_frames = n_frames
        self.fmin, self.fmax = fmin, fmax
        self.image_size = image_size
        self.aug = aug
        self.scenes = self._build(max_scenes)

    @staticmethod
    def calib_read():
        return np.array([320.0, 320.0, 320.0, 240.0])

    @staticmethod
    def depth_read(path):
        depth = np.load(path) / TartanAirDataset.DEPTH_SCALE
        depth[~np.isfinite(depth)] = 1.0
        return depth

    def _build(self, max_scenes):
        scenes = sorted(glob.glob(osp.join(self.root, "*/*/*/*")))
        if max_scenes:
            scenes = scenes[:max_scenes]
        out = []
        for scene in scenes:
            images = sorted(glob.glob(osp.join(scene, "image_left/*.png")))
            depths = sorted(glob.glob(osp.join(scene, "depth_left/*.npy")))
            if len(images) != len(depths) or len(images) < self.n_frames:
                continue
            poses = np.loadtxt(osp.join(scene, "pose_left.txt"),
                               delimiter=" ")
            # NED -> (x, y, z, qx, qy, qz, qw)
            poses = poses[:, [1, 2, 0, 4, 5, 3, 6]]
            poses[:, :3] /= self.DEPTH_SCALE
            intr = np.tile(self.calib_read()[None], (len(images), 1))
            D = flow_distance_matrix(poses, depths, intr,
                                     read_depth=self.depth_read,
                                     max_frames=min(len(images), 400))
            out.append(SceneInfo(images, depths, poses, intr,
                                 {"dist": D}))
        return out

    # ----------------------------------------------------------- sampling
    def sample_clip(self, rng):
        """Walk the flow graph to assemble an n_frames clip
        (`base.py:98-139`)."""
        scene = self.scenes[rng.integers(len(self.scenes))]
        D = scene.graph["dist"]
        n = D.shape[0]
        ix = int(rng.integers(0, n - 1))
        inds = [ix]
        while len(inds) < self.n_frames:
            cand = np.where((D[ix] > self.fmin) & (D[ix] < self.fmax))[0]
            fwd = cand[cand > ix]
            if len(fwd):
                ix = int(rng.choice(fwd))
            elif ix + 1 < n:
                ix = ix + 1
            elif len(cand):
                ix = int(rng.choice(cand))
            inds.append(ix)

        images, disps = [], []
        for i in inds:
            img = cv2.imread(scene.images[i])
            depth = self.depth_read(scene.depths[i])
            img, depth = self._resize(img, depth)
            images.append(img)
            disps.append(1.0 / np.maximum(depth, 1e-3))
        images = np.stack(images)
        disps = np.stack(disps)
        poses_c2w = scene.poses[inds].astype(np.float32)
        intr = scene.intrinsics[inds][0].astype(np.float32).copy()

        if self.aug:
            images = self._augment_color(images, rng)

        # disparity normalization (`base.py:165-167`)
        s = 0.7 * np.quantile(disps, 0.98)
        disps = disps / s
        poses_c2w = poses_c2w.copy()
        poses_c2w[:, :3] *= s

        import jax.numpy as jnp
        poses_w2c = np.asarray(lie.se3_inv(jnp.asarray(poses_c2w)))
        # disparities at feature (1/4) scale
        disps4 = disps[:, 1::4, 1::4]
        return images.astype(np.uint8), poses_w2c, disps4.astype(np.float32), intr

    def _resize(self, img, depth):
        H, W = self.image_size
        h, w = img.shape[:2]
        sx, sy = W / w, H / h
        img = cv2.resize(img, (W, H))
        depth = cv2.resize(depth, (W, H), interpolation=cv2.INTER_NEAREST)
        return img, depth

    @staticmethod
    def _augment_color(images, rng):
        """Photometric jitter (`augmentation.py`)."""
        gain = rng.uniform(0.8, 1.2)
        bias = rng.uniform(-20, 20)
        out = np.clip(images.astype(np.float32) * gain + bias, 0, 255)
        if rng.random() < 0.5:
            # channel shuffle-free saturation jitter
            gray = out.mean(axis=-1, keepdims=True)
            alpha = rng.uniform(0.7, 1.3)
            out = np.clip(gray + alpha * (out - gray), 0, 255)
        return out.astype(np.uint8)

    def batches(self, batch_size, steps, seed=0):
        """Yield train_step-shaped batches."""
        rng = np.random.default_rng(seed)
        for _ in range(steps):
            clips = [self.sample_clip(rng) for _ in range(batch_size)]
            yield {
                "images": np.stack([c[0] for c in clips]),
                "poses": np.stack([c[1] for c in clips]),
                "disps": np.stack([c[2] for c in clips]),
                "intrinsics": np.stack([c[3] for c in clips]),
            }


def dataset_factory(names, root, **kwargs):
    """`data_readers/factory.py` equivalent."""
    registry = {"tartan": TartanAirDataset}
    datasets = [registry[n](root, **kwargs) for n in names]
    return datasets[0] if len(datasets) == 1 else datasets
