#!/bin/bash
# Final trained-checkpoint sweep (step_2000 continuation checkpoint).
# Host-CPU evaluation of every learned-weights claim in docs/ROUND2.md:
# multi-scene SLAM ATE, closed-loop revisit gap on the rendered
# out-and-back world, and the full video->SLAM->COLMAP->NeRF chain with
# and without pose refinement (eval-pose-aligned scoring). Held-out
# flow/pose EPE is printed by the learn_synth training run itself.
# Usage: bash scripts/final_evals.sh [CKPT [OUTDIR]]
set -u
cd "$(dirname "$0")/.."
CKPT=${1:-/tmp/synth_params4/step_2000}
OUT=${2:-/tmp/final_evals}
mkdir -p "$OUT"

run() {
  local name=$1; shift
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout 7200 python -u scripts/cpurun.py "$@" \
      > "$OUT/$name.log" 2>&1
  echo "rc=$?"; tail -2 "$OUT/$name.log"
}

run suite wild_video_3d_reconstruction_tpu.eval.synth_suite \
    --params "$CKPT" --trials 2 --markdown "$OUT/suite.md"
run loop_render wild_video_3d_reconstruction_tpu.eval.loop_ate \
    --render --params "$CKPT" --seeds 3
run recon wild_video_3d_reconstruction_tpu.eval.recon_e2e \
    --params "$CKPT" --frames 40 --nerf_steps 600
run recon_norefine wild_video_3d_reconstruction_tpu.eval.recon_e2e \
    --params "$CKPT" --frames 40 --nerf_steps 600 --no_refine
echo "=== done ==="
