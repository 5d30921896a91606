"""Test configuration: force a virtual 8-device CPU mesh.

The build environment registers an `axon` remote-TPU backend in every Python
process via sitecustomize (PYTHONPATH=/root/.axon_site) and sets
jax_platforms="axon,cpu" at interpreter startup — BEFORE pytest conftests run.
Setting the env var here is therefore not enough; we must update the live jax
config. Tests run on host CPU devices (8 virtual devices for sharding tests);
the real TPU is exercised by bench.py and the driver only.
"""

import os

# WV3D_TEST_TPU=1 keeps the real device backend so `-m device_kernel`
# tests (compiled-Pallas checks) can run on hardware; default is the
# virtual CPU mesh.
_USE_TPU = os.environ.get("WV3D_TEST_TPU") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8, jax.devices()


# ---------------------------------------------------------------------------
# reference-oracle shim isolation
# ---------------------------------------------------------------------------
import contextlib  # noqa: E402
import sys as _sys  # noqa: E402


def _ref_module_keys():
    return [k for k in _sys.modules
            if k in ("torch_scatter", "dpvo") or k.startswith("dpvo.")]


@contextlib.contextmanager
def reference_shims():
    """Isolate `sys.modules` pollution from reference-code imports.

    The oracle test files (test_reference_oracle / test_ba_reference_oracle)
    install conflicting pure-torch shims for `torch_scatter` and the
    `dpvo.*` native extensions. Without teardown, whichever file runs first
    leaves its shims cached and the second file imports the reference
    against the wrong ones (order-dependent failures). Wrapping each
    module-scoped fixture in this context purges every reference module on
    teardown so the next importer starts fresh.
    """
    saved = {k: _sys.modules[k] for k in _ref_module_keys()}
    try:
        yield
    finally:
        for k in _ref_module_keys():
            del _sys.modules[k]
        _sys.modules.update(saved)
