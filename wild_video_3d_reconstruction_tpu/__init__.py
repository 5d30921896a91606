"""TPU-native rebuild of the Wild-video-3d-reconstruction (DPVO-style SLAM) pipeline.

A from-scratch JAX/XLA/Pallas framework providing the capabilities of the CUDA
reference (ljjTYJR/Wild-video-3d-reconstruction): deep patch visual odometry with
depth priors and dynamic-object masks, long-term loop closure with Sim(3) pose
graph optimization, COLMAP export and NeRF data preparation — designed TPU-first:

  * all SLAM state lives in fixed-shape HBM buffers (XLA static shapes),
  * the per-frame hot path is a handful of jitted megafunctions,
  * Lie-group / projective / bundle-adjustment math is pure JAX (fused by XLA),
  * the patch-correlation lookup has a Pallas TPU kernel with a jnp oracle,
  * multi-chip scaling uses jax.sharding Mesh + collectives (see `parallel/`).

Layout (mirrors SURVEY.md section 7 build plan):
  ops/       Lie groups, projective geometry, correlation, segment ops
  models/    VONet (encoders + update operator) and torch-weight conversion
  ba/        Gauss-Newton bundle adjustment + Sim(3) pose graph optimization
  slam/      the DPVO state machine over a fixed-shape patch graph
  parallel/  device mesh, sharded training step, host->device prefetch
  io/        frame streams, calibration, trajectory/COLMAP/PLY export
  loop/      loop-closure retrieval, matching, long-term closure orchestration
  train/     differentiable training forward graph + loss
  eval/      ATE/RPE metrics and TUM / EuRoC harnesses
  nerf/      nerfstudio data preparation and training drivers
  utils/     config system, timers
  native/    C++ host-side runtime components (graph bookkeeping, retrieval)
"""

__version__ = "0.2.0"
