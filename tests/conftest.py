"""Test harness: force an 8-device CPU simulation so data-parallel sharding is
tested without TPU hardware (the reference has no distributed tests at all,
SURVEY.md §4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize hard-sets jax_platforms="axon,cpu" at
# interpreter start; override it BEFORE any backend initialization so tests
# really run on the 8-device CPU simulation.
jax.config.update("jax_platforms", "cpu")

# Full-f32 matmuls for exact torch parity in numerics tests.
jax.config.update("jax_default_matmul_precision", "highest")
