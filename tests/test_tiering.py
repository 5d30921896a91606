"""Edge-prefix tiering correctness (slam/steps._run_tiered).

The tier cond is skipped on the CPU mesh by default (compile time); these
tests force it and prove the tiered region — update net + BA, flow
metric, retire/compact — produces exactly the same state as the untied
full-capacity path whenever the live count fits a smaller tier.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wild_video_3d_reconstruction_tpu.slam import DPVO, steps

from test_slam_smoke import HT, WD, synthetic_frames, tiny_config

pytestmark = pytest.mark.slow  # integration/soak tier



@pytest.fixture()
def forced_tiers(monkeypatch):
    monkeypatch.setattr(steps, "TIER_ON_CPU", True)
    monkeypatch.setattr(steps, "TIER_MIN_EDGES", 0)


def build_state():
    cfg = tiny_config()
    slam = DPVO(cfg, None, HT, WD, seed=0)
    slam._probe = lambda *a: 100.0
    intr = np.array([40.0, 40.0, WD / 2, HT / 2])
    for t, img in enumerate(synthetic_frames(16)):
        slam(t, img, intrinsics=intr)
    return cfg, slam


def test_tiered_update_op_matches_full(forced_tiers):
    cfg, slam = build_state()
    state = slam.state
    t0 = jnp.maximum(state.n_frames - cfg.OPTIMIZATION_WINDOW, 1)
    assert int(state.n_edges) < state.ii.shape[0] // 2, \
        "test premise: live edges must fit a smaller tier"

    cfg1 = cfg.merge_from_dict({"EDGE_TIERS": 1})
    cfg2 = cfg.merge_from_dict({"EDGE_TIERS": 2})
    out1 = jax.jit(lambda s: steps.update_op(cfg1, slam.params, s, t0))(state)
    out2 = jax.jit(lambda s: steps.update_op(cfg2, slam.params, s, t0))(state)

    live = int(state.n_edges)
    np.testing.assert_allclose(np.asarray(out1.poses),
                               np.asarray(out2.poses), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out1.target[:live]),
                               np.asarray(out2.target[:live]),
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out1.weight[:live]),
                               np.asarray(out2.weight[:live]),
                               rtol=0, atol=1e-3)
    # padded rows beyond the tier carry zero weight (inert)
    tier_rows = np.asarray(out2.weight[live:])
    assert np.all(np.isfinite(tier_rows))


def test_tiered_flow_metric_and_retire_match(forced_tiers):
    cfg, slam = build_state()
    state = slam.state
    cfg1 = cfg.merge_from_dict({"EDGE_TIERS": 1})
    cfg2 = cfg.merge_from_dict({"EDGE_TIERS": 2})

    i = state.n_frames - cfg.KEYFRAME_INDEX - 1
    j = state.n_frames - cfg.KEYFRAME_INDEX + 1
    f1 = float(jax.jit(lambda s: steps.flow_metric(cfg1, s, i, j))(state))
    f2 = float(jax.jit(lambda s: steps.flow_metric(cfg2, s, i, j))(state))
    assert abs(f1 - f2) < 1e-4, (f1, f2)

    r1 = jax.jit(lambda s: steps.retire_and_compact(cfg1, s))(state)
    r2 = jax.jit(lambda s: steps.retire_and_compact(cfg2, s))(state)
    assert int(r1.n_edges) == int(r2.n_edges)
    n = int(r1.n_edges)
    for f in ("ii", "jj", "kk"):
        np.testing.assert_array_equal(np.asarray(getattr(r1, f)[:n]),
                                      np.asarray(getattr(r2, f)[:n]))
    np.testing.assert_array_equal(np.asarray(r1.valid[:n]),
                                  np.asarray(r2.valid[:n]))
