"""Resolve repo-relative resource paths (configs/, calib/, checkpoints/)
from any CWD.

The reference assumes repo-root CWD for its YAML/calib defaults
(`/root/reference/dpvo_demo.py:154` passes `dpvo_configs/...` relative
paths). The rebuild is pip-installable (editable): default paths like
``configs/default.yaml`` resolve against, in order,

1. the CWD (so explicit relative paths keep working exactly as before),
2. the repo root — the parent of this package (editable install layout),
3. ``$WV3D_ROOT`` if set (wheel installs or out-of-tree data).

Returns the path unchanged when nothing exists — callers keep their own
error behavior for genuinely missing files.
"""

import os
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent


def resource_path(rel):
    """Resolve `rel` against CWD, the repo root, then $WV3D_ROOT."""
    if rel is None:
        return rel
    p = Path(rel)
    if p.is_absolute() or p.exists():
        return str(rel)
    cand = _REPO_ROOT / p
    if cand.exists():
        return str(cand)
    env = os.environ.get("WV3D_ROOT")
    if env and (Path(env) / p).exists():
        return str(Path(env) / p)
    return str(rel)
