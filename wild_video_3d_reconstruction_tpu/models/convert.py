"""Torch checkpoint -> JAX param pytree conversion.

Loads the published `dpvo.pth` state dict (torch, CPU) and maps it onto the
functional VONet parameter tree, reproducing the reference's loading rules
(`dpvo/dpvo.py:215-226`): strip the `module.` prefix, drop `update.lmbda`.

Layout transforms:
  Conv2d  weight [O, I, kh, kw] -> [kh, kw, I, O]   (OIHW -> HWIO)
  Linear  weight [out, in]      -> [in, out]
  LayerNorm / biases copied as-is.
InstanceNorm layers are affine-free in the reference, so they carry no
parameters.
"""

from __future__ import annotations

import numpy as np


def _to_numpy(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _assign(tree, dotted, value):
    parts = dotted.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def convert_state_dict(state_dict, dtype=np.float32):
    """torch state dict (name -> tensor) -> nested param dict.

    Accepts raw reference checkpoints (keys like
    `module.patchify.fnet.conv1.weight`).
    """
    params = {}
    for name, tensor in state_dict.items():
        if "update.lmbda" in name:
            continue
        name = name.replace("module.", "")
        v = _to_numpy(tensor).astype(dtype)

        if name.startswith("patchify.fnet."):
            out_name = "fnet." + name[len("patchify.fnet."):]
        elif name.startswith("patchify.inet."):
            out_name = "inet." + name[len("patchify.inet."):]
        elif name.startswith("update."):
            out_name = name
        else:
            # unknown entry (e.g. buffers) — skip
            continue

        # Sequential(conv, norm) downsample: the conv is index 0
        out_name = out_name.replace("downsample.0.", "downsample.")

        if name.endswith("weight"):
            if v.ndim == 4:          # conv OIHW -> HWIO
                v = np.transpose(v, (2, 3, 1, 0))
            elif v.ndim == 2:        # linear [out, in] -> [in, out]
                v = np.transpose(v)
        _assign(params, out_name, v)
    return params


def load_torch_checkpoint(path, dtype=np.float32):
    """Load `dpvo.pth` and convert. Torch is only used on the host here."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "model" in state:
        state = state["model"]
    return convert_state_dict(state, dtype=dtype)


def params_to_state_dict(params, prefix=""):
    """Inverse mapping (JAX pytree -> torch-layout state dict), for
    checkpoint export / interop tests."""
    out = {}
    for k, v in params.items():
        name = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
        if isinstance(v, dict):
            out.update(params_to_state_dict(v, name))
        else:
            arr = np.asarray(v)
            if name.endswith("weight"):
                if arr.ndim == 4:
                    arr = np.transpose(arr, (3, 2, 0, 1))
                elif arr.ndim == 2:
                    arr = np.transpose(arr)
            out[name] = arr
    return out
