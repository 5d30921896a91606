#!/bin/bash
# Synthetic-learning evaluation sweep with trained VONet checkpoints.
# Runs on the host CPU (scripts/cpurun.py forces the cpu backend); each
# stage appends one JSON line to /tmp/trained_evals/<stage>.log.
# Usage: bash scripts/trained_evals.sh [P2 [P3]]
#   P2: orbax dir of the mid checkpoint (default /tmp/synth_params2/step_900)
#   P3: orbax dir of the late checkpoint (default /tmp/synth_params3/step_1000)
set -u
cd "$(dirname "$0")/.."
P2=${1:-/tmp/synth_params2/step_900}
P3=${2:-/tmp/synth_params3/step_1000}
mkdir -p /tmp/trained_evals

run() {
  local name=$1; shift
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout 3600 python -u scripts/cpurun.py "$@" \
      > "/tmp/trained_evals/$name.log" 2>&1
  echo "rc=$? "; tail -2 "/tmp/trained_evals/$name.log"
}

run sate_900  wild_video_3d_reconstruction_tpu.eval.synth_ate \
    --params "$P2" --frames 60 --trials 2
run sate_1000 wild_video_3d_reconstruction_tpu.eval.synth_ate \
    --params "$P3" --frames 60 --trials 2
run recon_900 wild_video_3d_reconstruction_tpu.eval.recon_e2e \
    --params "$P2" --frames 40 --nerf_steps 600
run recon_900_norefine wild_video_3d_reconstruction_tpu.eval.recon_e2e \
    --params "$P2" --frames 40 --nerf_steps 600 --no_refine
echo "=== done ==="
