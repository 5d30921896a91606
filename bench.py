"""Benchmark: end-to-end VO throughput at 512x384 on the TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline target: 60 FPS (2x real-time) at 512x384 on one v5e chip
(BASELINE.md). Synthetic in-memory frames isolate device throughput from
disk decode (the real pipeline overlaps decode via io.stream.Prefetcher).

Self-tuning (VERDICT r2 #1): the dispatch strategy that wins depends on the
session's relay characteristics (per-execute RTT and transfer bandwidth vary
across remote-TPU sessions and workers), so the bench A/B-probes a small
candidate set — PIPELINE_CHUNK x PALLAS_FUSED — under a wall-clock budget,
reports every candidate's FPS, and selects the best for the headline number.
Each candidate is measured with `trials` independent timed windows (best
taken) and the JSON carries a device-vs-host breakdown:

  device_ms_per_frame   back-to-back re-dispatch of the steady-state
                        program on a fixed state, one closing sync — the
                        device-bound floor
  loop_ms_per_frame     the actual feed-loop time (uploads + host + device)
  overhead_ms_per_frame difference: host prep + relay dispatch/transfer cost
"""

import argparse
import json
import sys
import time

import numpy as np

HT, WD = 384, 512
BASELINE_FPS = 60.0


def synthetic_frames(n, ht=None, wd=None, seed=0):
    ht = HT if ht is None else ht      # read globals at CALL time so the
    wd = WD if wd is None else wd      # --size override applies
    rng = np.random.default_rng(seed)
    big = rng.integers(0, 255, size=(ht + 256, wd + 256, 3),
                       dtype=np.uint8)
    frames = []
    for t in range(n):
        y, x = (5 * t) % 256, (7 * t) % 256
        frames.append(np.ascontiguousarray(big[y:y + ht, x:x + wd]))
    return frames


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def run_candidate(config, chunk, fused, frames, intr, warmup, timed,
                  trials, buffer, loop):
    """Build a DPVO for (chunk, fused), feed frames, return measurements.

    Returns dict with fps (best-of-trials), loop_ms, device_ms, overhead_ms.
    """
    import jax

    from wild_video_3d_reconstruction_tpu.slam import DPVO
    from wild_video_3d_reconstruction_tpu.utils.config import load_config

    cfg = load_config(config, BUFFER_SIZE=buffer, PIPELINE_CHUNK=chunk,
                      PALLAS_FUSED=fused,
                      **({"loop_enabled": True} if loop else {}))
    slam = DPVO(cfg, None, HT, WD, seed=0)
    if loop:
        from wild_video_3d_reconstruction_tpu.loop.longterm import \
            LongTermLoopClosure
        slam.loop_closure = LongTermLoopClosure(cfg, slam)
    # random weights would stall the motion-probe gate; force acceptance so
    # the benchmark exercises the full steady-state tracking path
    slam._probe = lambda *a: 100.0

    def sync():
        _ = np.asarray(slam.state.poses[:1])

    # keep timed windows on chunk boundaries so no partial-tail path runs
    step = max(chunk, 1)
    timed = (timed // step) * step

    # upload-ahead staging thread: device_put through a relay-attached
    # TPU BLOCKS at the tunnel's bandwidth (~0.6 MB/frame; measured
    # 3-5 ms/frame of loop overhead when uploaded inline), so frames are
    # staged from a background thread exactly like the production
    # io.stream.Prefetcher(device_upload=True) overlaps decode+upload
    # with device compute
    import threading
    dev = {}
    stop = []

    def _uploader():
        ti = 0
        while not stop:
            if ti < len(frames):
                dev[ti] = jax.device_put(frames[ti])
                ti += 1
            else:
                time.sleep(0.002)

    th = threading.Thread(target=_uploader, daemon=True)
    th.start()

    results = []
    t_start = None
    n_start = 0
    t = 0
    windows_done = 0
    while windows_done < trials:
        if t >= len(frames):
            frames.extend(synthetic_frames(len(frames), seed=1 + t))
        while t not in dev:
            time.sleep(0.0005)
        slam(t, dev.pop(t), intrinsics=intr)
        t += 1
        boundary = slam.is_initialized and not slam._pending
        if t_start is None and t >= warmup and boundary:
            sync()             # a VALUE fetch is the only true device sync
            t_start = time.perf_counter()
            n_start = slam._events_dispatched
        elif t_start is not None and boundary and \
                slam._events_dispatched - n_start >= timed:
            sync()
            dt = time.perf_counter() - t_start
            n = slam._events_dispatched - n_start
            results.append((n / dt, 1000.0 * dt / n))
            windows_done += 1
            t_start = time.perf_counter()
            n_start = slam._events_dispatched

    stop.append(1)
    fps, loop_ms = max(results)

    # ---- device-bound floor: re-dispatch the steady-state program on a
    # fixed state, back to back, one closing sync ------------------------
    device_ms = None
    try:
        import jax.numpy as jnp
        state = slam.state
        sig = (False, False)
        if chunk > 1:
            imgs = jax.device_put(np.stack(frames[:chunk]))
            intrs = jnp.asarray(np.stack([intr] * chunk).astype(np.float32))
            facs = jnp.ones((chunk,), jnp.float32)
            fn = slam._chunk[sig]
            args = (state, slam.params, imgs, intrs, facs,
                    slam._zero_dep_chunk, slam._zero_msk_chunk)
            per_call = chunk
        else:
            img_d = jax.device_put(frames[0])
            fn = slam._frame[sig]
            args = (state, slam.params, img_d,
                    jnp.asarray(intr, jnp.float32), jnp.float32(1.0),
                    slam._zero_dep, slam._zero_msk)
            per_call = 1
        out = fn(*args)
        _ = np.asarray(out.poses[:1])
        reps = max(2, 32 // per_call)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _ = np.asarray(out.poses[:1])
        device_ms = 1000.0 * (time.perf_counter() - t0) / (reps * per_call)
    except Exception as e:          # breakdown is diagnostic, not critical
        log(f"device-floor measurement failed: {e!r}")

    return {
        "fps": round(fps, 2),
        "loop_ms": round(loop_ms, 2),
        "device_ms": round(device_ms, 2) if device_ms else None,
        "overhead_ms": round(loop_ms - device_ms, 2) if device_ms else None,
        "trials": [round(f, 2) for f, _ in results],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/fast.yaml")
    ap.add_argument("--size", type=int, nargs=2, default=None,
                    metavar=("H", "W"),
                    help="frame size override (default 384 512; used by "
                         "the CPU logic test)")
    ap.add_argument("--warmup", type=int, default=24)
    ap.add_argument("--timed", type=int, default=48,
                    help="frames per timed window")
    ap.add_argument("--trials", type=int, default=3,
                    help="timed windows per candidate (best taken)")
    ap.add_argument("--buffer", type=int, default=256)
    ap.add_argument("--loop", action="store_true",
                    help="enable async loop closure (measures LC-mode FPS)")
    ap.add_argument("--budget", type=float, default=2700.0,
                    help="wall-clock budget (s); candidate 1 always runs, "
                         "later candidates only while under budget")
    ap.add_argument("--candidates", default="16:0,8:1,8:0",
                    help="comma list of CHUNK:FUSED probes, best wins")
    args = ap.parse_args()
    global HT, WD
    if args.size:
        HT, WD = args.size

    # A dead relay tunnel makes jax.devices() hang forever (observed:
    # multi-hour axon outages). Probe in a subprocess first so the driver
    # gets a parseable failure line instead of a timeout.
    import os
    import subprocess
    if os.environ.get("JAX_PLATFORMS", "") not in ("cpu",):
        try:
            p = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=420, capture_output=True)
            ok = p.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if not ok:
            print(json.dumps({
                "metric": "vo_fps_512x384_fast48", "value": 0.0,
                "unit": "fps", "vs_baseline": 0.0,
                "error": "TPU backend unreachable (relay tunnel down)"}))
            return 0

    import jax

    try:  # persistent compile cache: repeated bench runs skip XLA compiles
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    intr = np.array([400.0, 400.0, WD / 2, HT / 2])
    frames = synthetic_frames(args.warmup + args.timed * (args.trials + 1))

    cands = []
    for spec in args.candidates.split(","):
        c, f = spec.split(":")
        cands.append((int(c), bool(int(f))))

    t_bench = time.perf_counter()
    report = {}
    for i, (chunk, fused) in enumerate(cands):
        elapsed = time.perf_counter() - t_bench
        if i > 0 and elapsed > args.budget:
            log(f"budget exhausted ({elapsed:.0f}s); skipping "
                f"chunk={chunk} fused={fused}")
            continue
        key = f"chunk{chunk}_fused{int(fused)}"
        log(f"candidate {key} (elapsed {elapsed:.0f}s) ...")
        try:
            r = run_candidate(args.config, chunk, fused, list(frames), intr,
                              args.warmup, args.timed, args.trials,
                              args.buffer, args.loop)
            log(f"candidate {key}: {r}")
            report[key] = r
        except Exception as e:
            log(f"candidate {key} FAILED: {e!r}")
            report[key] = {"fps": 0.0, "error": repr(e)}

    best_key = max(report, key=lambda k: report[k]["fps"])
    best = report[best_key]

    import os.path
    cfg_tag = os.path.splitext(os.path.basename(args.config))[0]
    tag = {"fast": "fast48", "default": "default384",
           "mid": "mid192"}.get(cfg_tag, cfg_tag)
    out = {
        "metric": f"vo_fps_512x384_{tag}" + ("_loop" if args.loop else ""),
        "value": best["fps"],
        "unit": "fps",
        "vs_baseline": round(best["fps"] / BASELINE_FPS, 3),
        "chosen": best_key,
        "device_ms_per_frame": best.get("device_ms"),
        "loop_ms_per_frame": best.get("loop_ms"),
        "overhead_ms_per_frame": best.get("overhead_ms"),
        "candidates": {k: v.get("fps") for k, v in report.items()},
        "bench_wall_s": round(time.perf_counter() - t_bench, 1),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
