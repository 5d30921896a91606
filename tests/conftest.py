"""Test configuration: force a virtual 8-device CPU mesh.

The build environment registers an `axon` remote-TPU backend in every Python
process via sitecustomize (PYTHONPATH=/root/.axon_site) and sets
jax_platforms="axon,cpu" at interpreter startup — BEFORE pytest conftests run.
Setting the env var here is therefore not enough; we must update the live jax
config. Tests run on host CPU devices (8 virtual devices for sharding tests);
the real TPU is exercised by bench.py and the driver only.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, jax.devices()
