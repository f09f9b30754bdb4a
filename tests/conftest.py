"""Test configuration: force an 8-device virtual CPU mesh.

Tests run on CPU with 8 virtual devices so sharding/multi-chip code paths
are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).

Note: the axon sitecustomize calls jax.config.update("jax_platforms",
"axon,cpu") at interpreter start, so setting the env var alone is not
enough -- we must flip the config back after importing jax, before any
backend initializes.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running e2e test")
