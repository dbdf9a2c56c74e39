"""Test config: force CPU with 8 virtual devices (multi-chip sharding tests
run on a virtual mesh; real-TPU perf is exercised by bench.py, not pytest),
and enable x64 so parity tests against the float64 reference are meaningful.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The axon TPU plugin force-registers itself regardless of JAX_PLATFORMS;
# config.update after import is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
