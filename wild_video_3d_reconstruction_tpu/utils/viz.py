"""Live 3D visualization (Rerun when available, file export fallback).

Counterpart of the reference's Rerun integration (`dpvo/dpvo.py:88-93,
148-177`: points, trajectory line strip, camera frusta, images) and the
optional dpviewer OpenGL window (`dpvo/dpvo.py:243-253`). Rerun is an
optional dependency; without it, snapshots are written as PLY + PNG so
runs remain inspectable.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


class Visualizer:
    def __init__(self, slam, path="viz_out", use_rerun=True, scale=100.0):
        self.slam = slam
        self.path = Path(path)
        self.scale = scale
        self.rr = None
        if use_rerun:
            try:
                import rerun as rr
                rr.init("DPVO-TPU Visualization")
                rr.connect()
                rr.set_time_sequence("#frame", 0)
                self.rr = rr
            except Exception:
                self.rr = None
        if self.rr is None:
            self.path.mkdir(parents=True, exist_ok=True)

    def update(self, frame_n=None, image=None):
        """Log current map + trajectory (`DPVO.rr_register_info`)."""
        import jax.numpy as jnp

        from ..ops import lie

        slam = self.slam
        n = slam.n if frame_n is None else frame_n
        points, colors = slam.points_and_colors()
        points = points * self.scale
        poses_c2w = np.asarray(lie.se3_inv(jnp.asarray(
            slam.state.poses[:max(slam.n, 1)])))
        translations = poses_c2w[:, :3] * self.scale

        if self.rr is not None:
            rr = self.rr
            rr.set_time_sequence("#frame", n)
            rr.log("world/points", rr.Points3D(points, colors=colors))
            rr.log("world/path", rr.LineStrips3D([translations],
                                                 colors=[[255, 0, 0]]))
            if image is not None:
                rr.log("world/image", rr.Image(image[..., ::-1]))
            intr = np.asarray(slam.state.intrinsics[0])
            rr.log(f"world/camera/{n}", rr.Pinhole(
                focal_length=float(intr[0]),
                height=slam.ht / 4, width=slam.wd / 4))
            rr.log(f"world/camera/{n}", rr.Transform3D(
                translation=translations[-1],
                rotation=rr.Quaternion(xyzw=poses_c2w[-1, 3:7]),
                scale=0.5))
        else:
            from ..io.export import save_ply
            save_ply(self.path / f"map_{n:05d}.ply", points, colors)
            np.savetxt(self.path / f"traj_{n:05d}.txt", poses_c2w)

    def final(self):
        self.update()
