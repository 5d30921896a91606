"""Phase-level timing of loop-closure-mode overhead in the steady loop.

Runs the bench workload with loop closure enabled and attributes wall
time to: the chunked dispatch itself, the per-interval log fetch
(np.asarray of the pipelined rows/descs), descriptor ingest (VLAD add +
JPEG cache), and attempt_loop_closure (retrieval + any closure tries).

Run: python -u scripts/loop_profile.py [--frames 80] [--chunk 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--warmup", type=int, default=25)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--config", default="configs/fast.yaml")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from wild_video_3d_reconstruction_tpu.loop.longterm import \
        LongTermLoopClosure
    from wild_video_3d_reconstruction_tpu.slam import DPVO
    from wild_video_3d_reconstruction_tpu.slam import dpvo as dpvo_mod
    from wild_video_3d_reconstruction_tpu.utils.config import load_config

    HT, WD = 384, 512
    cfg = load_config(args.config, BUFFER_SIZE=256,
                      PIPELINE_CHUNK=args.chunk, loop_enabled=True)
    slam = DPVO(cfg, None, HT, WD, seed=0)
    slam.loop_closure = LongTermLoopClosure(cfg, slam)
    slam._probe = lambda *a: 100.0

    acc = {"fetch_rows": 0.0, "fetch_descs": 0.0, "replay": 0.0,
           "attempt": 0.0, "ingest": 0.0, "n_sync": 0, "n_attempt": 0,
           "n_ingest": 0}

    lc = slam.loop_closure
    orig_add = lc.add_descriptor

    def timed_add(n, desc, image):
        t0 = time.perf_counter()
        orig_add(n, desc, image)
        acc["ingest"] += time.perf_counter() - t0
        acc["n_ingest"] += 1
    lc.add_descriptor = timed_add

    orig_attempt = lc.attempt_loop_closure

    def timed_attempt(n):
        t0 = time.perf_counter()
        orig_attempt(n)
        acc["attempt"] += time.perf_counter() - t0
        acc["n_attempt"] += 1
    lc.attempt_loop_closure = timed_attempt

    orig_sync = slam._lc_sync

    def timed_sync():
        # replicate _lc_sync with phase attribution
        lo = slam._lc_req_lo
        log_rows, desc_rows = slam._slice_logs(
            slam.state.log, slam.state.desc_log, np.int32(lo))
        for a in (log_rows, desc_rows):
            try:
                a.copy_to_host_async()
            except Exception:
                pass
        prev = slam._lc_pending
        slam._lc_pending = (lo, log_rows, desc_rows)
        slam._lc_req_lo = lo + slam.cfg.LC_INTERVAL
        if prev is not None:
            plo, prows, pdescs = prev
            t0 = time.perf_counter()
            prows = np.asarray(prows)
            t1 = time.perf_counter()
            pdescs = np.asarray(pdescs)
            t2 = time.perf_counter()
            slam._replay_events(prows, pdescs, plo)
            t3 = time.perf_counter()
            slam.loop_closure.attempt_loop_closure(slam.n_host)
            acc["fetch_rows"] += t1 - t0
            acc["fetch_descs"] += t2 - t1
            acc["replay"] += t3 - t2     # includes timed_add ingest
            acc["n_sync"] += 1
    slam._lc_sync = timed_sync

    rng = np.random.default_rng(0)
    big = rng.integers(0, 255, size=(HT + 256, WD + 256, 3), dtype=np.uint8)
    frames = [np.ascontiguousarray(big[(5 * t) % 256:(5 * t) % 256 + HT,
                                       (7 * t) % 256:(7 * t) % 256 + WD])
              for t in range(args.frames)]
    intr = np.array([400.0, 400.0, WD / 2, HT / 2])

    t_start = None
    ev_start = 0
    for t, img in enumerate(frames):
        slam(t, img, intrinsics=intr)
        if (t_start is None and t + 1 >= args.warmup
                and slam.is_initialized and not slam._pending):
            _ = np.asarray(slam.state.poses[:1])
            for k in acc:
                acc[k] = 0 if isinstance(acc[k], int) else 0.0
            t_start = time.perf_counter()
            ev_start = slam._events_dispatched
    extra = 0
    while slam._pending:
        slam(len(frames) + extra, frames[extra % len(frames)],
             intrinsics=intr)
        extra += 1
    _ = np.asarray(slam.state.poses[:1])
    elapsed = time.perf_counter() - t_start
    n = slam._events_dispatched - ev_start

    print(f"frames timed: {n}, total {elapsed*1e3:.1f} ms "
          f"({n/elapsed:.2f} FPS)")
    for k in ("fetch_rows", "fetch_descs", "replay", "ingest", "attempt"):
        print(f"  {k:12s} {acc[k]*1e3:8.1f} ms total "
              f"({acc[k]/n*1e3:6.2f} ms/frame)")
    print(f"  syncs={acc['n_sync']} attempts={acc['n_attempt']} "
          f"ingests={acc['n_ingest']}")


if __name__ == "__main__":
    main()
