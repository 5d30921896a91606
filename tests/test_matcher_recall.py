"""Loop-closure matcher precision/recall against GT correspondences.

Pins the VERDICT r3 #4 measurement (eval/matcher_recall.py): the
Shi-Tomasi + fnet mutual-NN matcher holds high recall on the hardened
worlds (occluder + exposure jitter) at a substantial viewpoint delta —
the regime where the reference leans on DISK+LightGlue. Full sweep with
the trained checkpoint (docs/ROUND4.md): recall 0.96-1.00 everywhere,
precision 0.79-1.00 (losses concentrate on the moving occluder, which
the downstream RANSAC-Umeyama gate rejects).
"""

import numpy as np
import pytest

import jax

from wild_video_3d_reconstruction_tpu.eval.matcher_recall import run_pair
from wild_video_3d_reconstruction_tpu.models.vonet import init_vonet
from wild_video_3d_reconstruction_tpu.train.synth import render_clip

pytestmark = pytest.mark.slow


def test_matcher_pr_on_hardened_world():
    # descriptors need the trained fnet (random init scores recall ~0.2);
    # the committed r3 checkpoint is the shipping operating point
    from wild_video_3d_reconstruction_tpu.train.trainer import \
        load_checkpoint
    params = load_checkpoint("checkpoints/synth_tpu_r3_step2000",
                             init_vonet(jax.random.PRNGKey(0)))
    rng = np.random.default_rng(1001)   # seed with an occluder draw
    images, poses, disps, intr = render_clip(
        rng, frames=7, ht=96, wd=128, fx=76.8, fy=76.8, n_planes=3,
        harden=True)
    r = run_pair(images, poses, disps, intr, 0, 6, params)
    assert r["matchable"] > 20, r
    assert r["recall"] > 0.85, r
    assert r["precision"] > 0.6, r
