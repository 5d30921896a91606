#!/bin/bash
# TPU measurement queue — run the moment the relay tunnel is back.
# Each stage logs to /tmp/tpuq/ and keeps going on failure; first compiles
# of frame_step-sized jits take 3-8 min each (remote compile helper), so
# every stage gets a long timeout. Run with:
#   bash scripts/tpu_queue.sh            # full queue
#   bash scripts/tpu_queue.sh bench      # just one stage
set -u
mkdir -p /tmp/tpuq
cd "$(dirname "$0")/.."
# scripts/*.py invocations need the repo root importable (sys.path[0] is
# scripts/ when running a file path)
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

stage() {
  local name=$1; shift
  local tmo=$1; shift
  if [ $# -eq 0 ]; then return; fi
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout "$tmo" python -u "$@" > "/tmp/tpuq/$name.log" 2>&1
  echo "rc=$? (log: /tmp/tpuq/$name.log)"
  tail -15 "/tmp/tpuq/$name.log"
}

want() { local s=$1; shift; [ $# -eq 0 ] || [[ " $* " == *" $s "* ]]; }

# 0. sanity: device answers
timeout 120 python -u -c "import jax; print(jax.devices())" || {
  echo "TPU still down"; exit 1; }

# bench FIRST: it is the exact command the round driver runs, so running
# it here warms /tmp/jaxcache before the driver's timed invocation
want bench   "$@" && stage bench 1800 bench.py
want fused   "$@" && stage fused 2400 bench.py --fused
want profile "$@" && stage profile 2400 profile_steps.py
want loop    "$@" && stage loop 1800 bench.py --loop
want bench384 "$@" && stage bench384 2400 bench.py --config configs/default.yaml --frames 60 --warmup 20
want numerics "$@" && stage numerics 1800 scripts/tpu_numerics.py
want approx  "$@" && stage approx 2400 -m wild_video_3d_reconstruction_tpu.eval.pallas_approx --frames 28 --size 192 256
# native NeRF on device: PSNR + steps/s of the jitted NGP train step
want nerf    "$@" && stage nerf 2400 -m wild_video_3d_reconstruction_tpu.nerf.train_native --synth --steps 2000 --batch 8192 --eval_every 1000
want nerfref "$@" && stage nerfref 2400 -m wild_video_3d_reconstruction_tpu.nerf.train_native --synth --steps 2000 --batch 8192 --eval_every 1000 --refine
# opt-in (not in the default queue): TPU-accelerated synthetic training
want learn   "$@" && [ $# -gt 0 ] && stage learn 3600 -m wild_video_3d_reconstruction_tpu.eval.learn_synth --steps 2000 --save /tmp/synth_params_tpu
want sate    "$@" && [ $# -gt 0 ] && stage sate 2400 -m wild_video_3d_reconstruction_tpu.eval.synth_ate --params /tmp/synth_params_tpu/step_2000 --trials 3
want suite   "$@" && [ $# -gt 0 ] && stage suite 7200 -m wild_video_3d_reconstruction_tpu.eval.synth_suite --params /tmp/synth_params_tpu/step_2000 --trials 3 --markdown /tmp/tpuq/synth_suite_tpu.md
echo "=== queue done ==="
