"""Pallas correlation kernel numerics ON REAL TPU HARDWARE.

The pytest parity suite forces JAX_PLATFORMS=cpu + interpret=True, so it
never exercises Mosaic codegen or real bf16 MXU rounding. This script
runs the v1 and v2 (fused) kernels against the fp32 XLA oracle on the
actual chip at SLAM-shaped sizes (patch-structured coordinates: 3x3
grids around a center, like real reprojections).

Run: python -u scripts/tpu_numerics.py [--edges 900] [--frames 12]
"""

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=900)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--width", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("device:", dev, "platform:", dev.platform)
    if dev.platform == "cpu":
        print("ERROR: this script must run on the TPU backend")
        return 1

    from wild_video_3d_reconstruction_tpu.ops import corr as corr_ops
    from wild_video_3d_reconstruction_tpu.ops import pallas_corr
    from wild_video_3d_reconstruction_tpu.ops.patchify import avg_pool2d

    E, F, H, W, C, M = args.edges, args.frames, args.height, args.width, \
        128, 8
    rng = np.random.default_rng(0)
    gmap = jnp.asarray(rng.normal(size=(F * M, C, 3, 3)), jnp.float32)
    fmap = jnp.asarray(rng.normal(size=(F, H, W, C)), jnp.float32)
    pyr = (fmap, avg_pool2d(fmap, 4))
    centers = np.stack([rng.uniform(4, W - 5, E), rng.uniform(4, H - 5, E)],
                       -1)
    offs = np.arange(3) - 1.0
    coords = np.zeros((E, 3, 3, 2))
    coords[..., 0] = centers[:, None, None, 0] + offs[None, None, :] \
        + rng.normal(0, 0.5, (E, 3, 3))
    coords[..., 1] = centers[:, None, None, 1] + offs[None, :, None] \
        + rng.normal(0, 0.5, (E, 3, 3))
    coords = jnp.asarray(coords, jnp.float32)
    kk = jnp.asarray(rng.integers(0, F * M, E), jnp.int32)
    jj = jnp.asarray(rng.integers(0, F, E), jnp.int32)

    ref = np.asarray(jax.jit(corr_ops.patch_corr_pyramid, static_argnames=(
        "radius",))(gmap, pyr, coords, kk, jj, radius=3))
    scale = np.abs(ref).max() + 1e-6

    for name, fused in (("v1", False), ("v2-fused", True)):
        out = np.asarray(jax.jit(
            pallas_corr.patch_corr_pyramid_pallas,
            static_argnames=("radius", "fused"))(
                gmap, pyr, coords, kk, jj, radius=3, fused=fused))
        rel = np.abs(out - ref).max() / scale
        print(f"{name}: max rel err vs fp32 oracle = {rel:.4%} "
              f"({'OK' if rel < 0.02 else 'FAIL'})")
        if rel >= 0.02:
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
