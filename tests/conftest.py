"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices — the TPU analog of a fake
backend (SURVEY §4): multi-chip sharding paths are exercised without TPU
hardware.  Env vars must be set before jax initializes, hence at module
import time here.
"""

import os
import sys

# Force CPU: the session env pins JAX_PLATFORMS=axon (the tunneled TPU);
# tests must run on the virtual 8-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# sitecustomize preimports jax with jax_platforms="axon,cpu" (the tunneled
# TPU first); env vars alone are too late, so override the live config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
