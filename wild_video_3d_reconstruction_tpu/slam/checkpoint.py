"""Mid-run SLAM state checkpoint / resume.

The reference cannot snapshot a run (SURVEY §5: "SLAM state itself is not
checkpointable mid-run") — its state is scattered across torch tensors,
numpy arrays and Python dicts. Here the device state is one pytree of
fixed-shape arrays (`slam/state.py`), so a checkpoint is a single
`np.savez` plus a small JSON of host bookkeeping; resume restores both and
continues tracking from the same frame. Useful for long in-the-wild runs
(crash recovery, or splitting a multi-hour sequence across preemptible
workers).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from .state import SLAMState


def save_slam(slam, path):
    """Snapshot a DPVO instance (device state + host bookkeeping)."""
    slam._flush_pending()          # chunked mode: fold queued frames in
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    arrays, dtypes = {}, {}
    for f in SLAMState._fields:
        a = np.asarray(getattr(slam.state, f))
        dtypes[f] = str(a.dtype)
        if a.dtype.name == "bfloat16":      # npz has no bf16: store bits
            a = a.view(np.uint16)
        arrays[f] = a
    np.savez_compressed(p / "state.npz", **arrays)
    with open(p / "dtypes.json", "w") as f:
        json.dump(dtypes, f)
    host = {
        "counter": slam.counter,
        "n_host": slam.n_host,
        "is_initialized": slam.is_initialized,
        "tlist": list(map(float, slam.tlist)),
        "tstamps": [int(t) for t in slam.tstamps[:slam.n_host]],
        "delta": {str(k): [int(v[0]), np.asarray(v[1]).tolist()]
                  for k, v in slam.delta.items()},
        "parked": list(slam.parked),
        "init_counter": slam._init_counter,
        "events_dispatched": slam._events_dispatched,
        "events_consumed": slam._events_consumed,
        "lc_req_lo": slam._lc_req_lo,
    }
    with open(p / "host.json", "w") as f:
        json.dump(host, f)


def load_slam(slam, path):
    """Restore a snapshot into a freshly-constructed DPVO (same config +
    image size). Returns the DPVO for chaining."""
    p = Path(path)
    data = np.load(p / "state.npz")
    with open(p / "dtypes.json") as f:
        dtypes = json.load(f)

    with open(p / "host.json") as f:
        host = json.load(f)

    def restore(f):
        if f == "rng" and f not in data:
            # pre-rng-in-state checkpoint: migrate the old host-side key
            # (or reseed deterministically) so old runs stay resumable
            key = host.get("key", [0, 0])
            return jnp.asarray(np.asarray(key, np.uint32))
        a = data[f]
        if dtypes[f] == "bfloat16":
            return jnp.asarray(a).view(jnp.bfloat16)
        return jnp.asarray(a)

    slam.state = SLAMState(**{f: restore(f) for f in SLAMState._fields})
    slam.counter = host["counter"]
    slam.n_host = host["n_host"]
    slam.is_initialized = host["is_initialized"]
    slam.tlist = list(host["tlist"])
    for i, t in enumerate(host["tstamps"]):
        slam.tstamps[i] = t
    slam.delta = {int(k): (v[0], np.asarray(v[1], np.float32))
                  for k, v in host["delta"].items()}
    slam.parked = list(host["parked"])
    slam._init_counter = host["init_counter"]
    slam._events_dispatched = host["events_dispatched"]
    slam._events_consumed = host["events_consumed"]
    slam._lc_req_lo = host["lc_req_lo"]
    return slam
