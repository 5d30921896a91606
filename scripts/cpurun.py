"""Run a module on the host CPU backend regardless of the axon TPU relay.

The build image's sitecustomize registers the `axon` TPU platform and sets
``jax_platforms`` before user code runs, so ``JAX_PLATFORMS=cpu`` in the
environment is NOT enough — the config must be updated before first device
use. This wrapper does that, then executes the requested module exactly like
``python -m``:

    python scripts/cpurun.py wild_video_3d_reconstruction_tpu.eval.synth_ate --frames 30
"""

import os
import runpy
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

module = sys.argv[1]
sys.argv = [module] + sys.argv[2:]
runpy.run_module(module, run_name="__main__", alter_sys=True)
