"""Scene bootstrap from external depth/pose priors (MASt3R-style init).

Counterpart of the reference's experimental `dpvo_mast3r_init.py:45-149`
(dust3r/mast3r global alignment with first-frame anchoring) and
`PatchGraph.init_from_prior` (`dpvo/patchgraph.py:112-140`): given dense
metric depths and camera-to-world pose matrices for the first frames (from
any external reconstruction — MASt3R, COLMAP, an RGB-D sensor), write them
into the SLAM state so tracking starts metrically anchored.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.vonet import RES
from ..ops import lie


def init_from_prior(slam, depths, poses_c2w, indices):
    """Initialize patch depths + poses of the given keyframe slots.

    depths:    [N, H, W] metric depth at full resolution
    poses_c2w: [N, 4, 4] camera-to-world matrices
    indices:   iterable of keyframe slots to initialize
    """
    st = slam.state
    M = slam.cfg.PATCHES_PER_FRAME
    patches = np.array(st.patches)
    patches_est = np.array(st.patches_est)
    poses = np.array(st.poses)

    w2c = np.asarray(lie.se3_inv(lie.se3_from_matrix(
        jnp.asarray(poses_c2w, jnp.float32))))

    for idx in indices:
        depth = np.asarray(depths[idx])
        H, W = depth.shape
        rows = patches[idx * M:(idx + 1) * M]
        px = np.clip((rows[:, 0] * RES).astype(int), 0, W - 1)
        py = np.clip((rows[:, 1] * RES).astype(int), 0, H - 1)
        med = np.median(depth[py, px].reshape(M, -1), axis=1)
        inv = 1.0 / np.maximum(med, 1e-6)
        rows[:, 2] = inv[:, None, None]
        patches[idx * M:(idx + 1) * M] = rows
        patches_est[idx * M:(idx + 1) * M] = rows
        poses[idx] = w2c[idx]

    slam.state = st._replace(patches=jnp.asarray(patches),
                             patches_est=jnp.asarray(patches_est),
                             poses=jnp.asarray(poses))


def anchor_first_frame(slam):
    """Re-anchor the trajectory so frame 0 is the identity (the reference's
    first-frame anchoring after global alignment)."""
    st = slam.state
    poses = jnp.asarray(st.poses)
    G0 = poses[0]
    rebased = lie.se3_mul(poses, jnp.broadcast_to(lie.se3_inv(G0),
                                                  poses.shape))
    slam.state = st._replace(poses=rebased)
