"""Bisect the okq/okv BA patch-table rollout divergence (VERDICT r3 #2).

Round 3 observed: building the BA per-patch edge table with okv (valid-
masked) membership + the shared kk-order is single-step bit-identical to
the shipped okq table on probed states, yet the oracle-SLAM rollout
(tests/test_slam_oracle.py) deterministically degrades (ATE 0.04 -> 0.18).

This script reruns the oracle rollout under both membership rules with a
per-frame state capture, finds the FIRST diverging device quantity, and
dumps the table-level diff at that step: per-patch member sets, liveness
of each member, and cap-overflow counts. Run on CPU (JAX_PLATFORMS=cpu).

Usage: python scripts/okv_bisect.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

# the build image's sitecustomize registers the axon remote-TPU backend and
# sets jax_platforms="axon,cpu" BEFORE any env var is consulted — the env
# alone does not force CPU here (tests/conftest.py has the same note)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from wild_video_3d_reconstruction_tpu.ba.gauss_newton import \
    _group_by_patch  # noqa: E402
from wild_video_3d_reconstruction_tpu.slam import DPVO, steps  # noqa: E402
from wild_video_3d_reconstruction_tpu.utils.config import \
    DPVOConfig  # noqa: E402

from test_slam_oracle import (N_FRAMES, gt_trajectory,  # noqa: E402
                              make_oracle_update)
from test_slam_smoke import HT, WD, synthetic_frames  # noqa: E402


def run_rollout(mode, capture, refine=40):
    """Run the oracle rollout under table-membership `mode`; the oracle
    update stays patched through refine + terminate (exactly like the
    pytest fixture). Returns (ate, snaps)."""
    steps._BA_TABLE_MODE = mode
    gt = gt_trajectory()
    orig = steps._run_update_net
    steps._run_update_net = make_oracle_update(gt)
    try:
        cfg = DPVOConfig(
            BUFFER_SIZE=64, PATCHES_PER_FRAME=8,
            REMOVAL_WINDOW=N_FRAMES + 2, OPTIMIZATION_WINDOW=N_FRAMES + 2,
            PATCH_LIFETIME=10, KEYFRAME_INDEX=2, KEYFRAME_THRESH=0.0,
            MEM=24, GRADIENT_BIAS=False, CORR_CHUNK=512, PALLAS_CORR=False)
        slam = DPVO(cfg, None, HT, WD, seed=0)
        slam._probe = lambda *a: 100.0
        intr = np.array([240.0, 240.0, WD / 2, HT / 2])
        snaps = []
        for t, img in enumerate(synthetic_frames(N_FRAMES)):
            slam(t, img, intrinsics=intr)
            if capture:
                s = slam.state
                snaps.append(dict(
                    poses=np.asarray(s.poses), patches=np.asarray(s.patches),
                    ii=np.asarray(s.ii), jj=np.asarray(s.jj),
                    kk=np.asarray(s.kk), valid=np.asarray(s.valid),
                    weight=np.asarray(s.weight),
                    n_frames=int(s.n_frames), n_edges=int(s.n_edges)))
        slam.refine(refine)
        poses_c2w, tstamps = slam.terminate()
        from wild_video_3d_reconstruction_tpu.eval import metrics
        from wild_video_3d_reconstruction_tpu.ops import lie
        gt_c2w = np.asarray(lie.se3_inv(gt))
        ate, _ = metrics.ate_rmse(poses_c2w, tstamps, gt_c2w,
                                  np.arange(N_FRAMES, dtype=float))
        return ate, cfg, snaps
    finally:
        steps._run_update_net = orig
        steps._BA_TABLE_MODE = "okq"


def table_diff(cfg, snap):
    """Build both tables from a snapshot (as update_op would at the NEXT
    frame, post-append — approximated here with the captured table) and
    report member-set differences."""
    M_ = cfg.patch_slots
    cap = 2 * cfg.PATCH_LIFETIME + 2
    n = snap["n_frames"]
    m_base = max(n - (cfg.patch_window_frames - 1), 0) * cfg.PATCHES_PER_FRAME
    kk = jnp.asarray(snap["kk"])
    valid = jnp.asarray(snap["valid"])
    q = kk - m_base
    okq = (q >= 0) & (q < M_)
    okv = valid & okq
    order = jnp.argsort(jnp.where(okv, kk, jnp.int32(1 << 30)), stable=True)
    t_okq = np.asarray(_group_by_patch(q, okq, M_, cap))
    t_okv = np.asarray(_group_by_patch(q, okv, M_, cap, order=order))
    E = kk.shape[0]
    v = np.asarray(valid)
    w = np.abs(snap["weight"]).sum(-1)
    qn = np.asarray(q)
    report = []
    for m in range(M_):
        mq = set(t_okq[m][t_okq[m] < E].tolist())
        mv = set(t_okv[m][t_okv[m] < E].tolist())
        live_q = {e for e in mq if v[e]}
        live_v = {e for e in mv if v[e]}
        n_members_total = int(((qn == m) & np.asarray(okq)).sum())
        if live_q != live_v or n_members_total > cap:
            dropped = live_v - live_q
            report.append(
                (m, len(mq), len(mv), n_members_total,
                 sorted(dropped), sorted(e for e in dropped if w[e] > 0)))
    return report


def main():
    print("rollout A: okq (shipped)")
    ate_a, cfg, snaps_a = run_rollout("okq", capture=True)
    print("rollout B: okv + shared order")
    ate_b, _, snaps_b = run_rollout("okv", capture=True)
    print(f"final Sim3 ATE: okq={ate_a:.6f}  okv={ate_b:.6f}")

    first = None
    for t, (a, b) in enumerate(zip(snaps_a, snaps_b)):
        dp = np.abs(a["poses"] - b["poses"]).max()
        dz = np.abs(a["patches"][:, 2] - b["patches"][:, 2]).max()
        print(f"frame {t:2d}: max|dpose|={dp:.3e} max|ddepth|={dz:.3e} "
              f"n_edges={a['n_edges']}")
        if first is None and (dp > 1e-7 or dz > 1e-7):
            first = t
    if first is None:
        print("NO DIVERGENCE — rollouts identical")
        return

    print(f"\nfirst divergence at frame {first}")
    # the update that diverged consumed the PREVIOUS frame's state
    # (plus append); diff tables on both the previous and diverging snap
    for t in (max(first - 1, 0), first):
        print(f"\ntable diff at snapshot {t} (okq-members vs okv-members, "
              f"cap={2 * cfg.PATCH_LIFETIME + 2}):")
        rep = table_diff(cfg, snaps_a[t])
        if not rep:
            print("  (no per-patch live-member differences)")
        for m, nq, nv, ntot, dropped, dropped_w in rep:
            print(f"  patch {m:3d}: |okq|={nq} |okv|={nv} "
                  f"total-okq-members={ntot} live-dropped-from-okq={dropped}"
                  f" (with weight: {dropped_w})")


if __name__ == "__main__":
    main()
