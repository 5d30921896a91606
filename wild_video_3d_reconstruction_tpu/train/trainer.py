"""Training driver: sharded steps + logging + orbax checkpointing.

The reference ships the forward graph and a tensorboard Logger
(`dpvo/logger.py:8-57`) but not the training script; this driver completes
the loop TPU-natively: the GSPMD train step from `parallel.train_step` over
a device mesh, running-mean metric logging every 100 steps, and orbax
checkpoints convertible back to torch layout via `models.convert`.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import numpy as np


class Logger:
    """Running-mean metrics every `log_freq` steps (tensorboard when
    available, JSONL always)."""

    SUM_FREQ = 100

    def __init__(self, name, logdir="runs"):
        self.logdir = Path(logdir) / name
        self.logdir.mkdir(parents=True, exist_ok=True)
        self.running = {}
        self.step = 0
        self._jsonl = open(self.logdir / "metrics.jsonl", "a")
        try:
            from torch.utils.tensorboard import SummaryWriter
            self.writer = SummaryWriter(str(self.logdir))
        except Exception:
            self.writer = None

    def push(self, metrics):
        self.step += 1
        for k, v in metrics.items():
            self.running[k] = self.running.get(k, 0.0) + float(v)
        if self.step % self.SUM_FREQ == 0:
            means = {k: v / self.SUM_FREQ for k, v in self.running.items()}
            line = {"step": self.step, **means, "time": time.time()}
            self._jsonl.write(json.dumps(line) + "\n")
            self._jsonl.flush()
            if self.writer:
                for k, v in means.items():
                    self.writer.add_scalar(k, v, self.step)
            print(f"[{self.step}] " + " ".join(
                f"{k}={v:.4f}" for k, v in means.items()))
            self.running = {}

    def close(self):
        self._jsonl.close()
        if self.writer:
            self.writer.close()


def save_checkpoint(params, path, step):
    import orbax.checkpoint as ocp

    path = Path(path).absolute() / f"step_{step}"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path, like_params):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).absolute(), like_params)


def export_torch_checkpoint(params, path):
    """Save a torch-layout .pth interoperable with the reference loader."""
    import torch

    from ..models.convert import params_to_state_dict

    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in params_to_state_dict(params).items()}
    torch.save(sd, path)
    return path


def train(dataset, steps=240000, batch_size=4, lr=8e-5, name="vonet",
          checkpoint_every=10000, logdir="runs", ckptdir="checkpoints_jax",
          n_devices=None, tc=None):
    """Full training loop (multi-chip via the parallel mesh)."""
    from ..models.vonet import init_vonet
    from ..parallel import TrainConfig, build_train_step, make_mesh
    from ..parallel.train_step import make_optimizer

    tc = tc or TrainConfig(frames=8, patches=32, steps=8)
    mesh = make_mesh(n_devices)
    params = init_vonet(jax.random.PRNGKey(0))
    step_fn, params, opt_state = build_train_step(
        mesh, params, tc, make_optimizer(lr=lr))

    logger = Logger(name, logdir)
    key = jax.random.PRNGKey(1)
    for i, batch in enumerate(dataset.batches(batch_size, steps)):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step_fn(params, opt_state, batch, sub)
        logger.push(metrics)
        if (i + 1) % checkpoint_every == 0:
            save_checkpoint(params, ckptdir, i + 1)
    logger.close()
    return params
