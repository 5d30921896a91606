"""Wall-clock section timing (the reference's `--timeit` facility).

Replaces the CUDA-event Timer (`dpvo/utils.py:8-31`) with
`block_until_ready`-bracketed wall timers; use `jax.profiler.trace` for deep
TPU traces (see `start_profile`).
"""

from __future__ import annotations

import time
from collections import defaultdict

import jax

_ALL_TIMES = defaultdict(list)


class Timer:
    def __init__(self, name, enabled=True, sync=None):
        self.name = name
        self.enabled = enabled
        self.sync = sync          # optional array/pytree to block on at exit

    def __enter__(self):
        if self.enabled:
            self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.enabled:
            if self.sync is not None:
                # a VALUE fetch is the only reliable device sync on
                # relay-attached TPUs (block_until_ready can be a no-op)
                target = self.sync() if callable(self.sync) else self.sync
                leaf = jax.tree.leaves(target)[0]
                jax.device_get(leaf.ravel()[:1])
            elapsed = 1000.0 * (time.perf_counter() - self.start)
            _ALL_TIMES[self.name].append(elapsed)
            print(f"{self.name} {elapsed:.2f}ms")


def timing_summary():
    for name, times in _ALL_TIMES.items():
        import numpy as np
        arr = np.asarray(times)
        print(f"[{name}] n={len(arr)} mean={arr.mean():.2f}ms "
              f"median={np.median(arr):.2f}ms total={arr.sum() / 1000:.2f}s")
    return dict(_ALL_TIMES)


def reset_timers():
    _ALL_TIMES.clear()


def start_profile(logdir="/tmp/jax-trace"):
    jax.profiler.start_trace(logdir)
    return logdir


def stop_profile():
    jax.profiler.stop_trace()
