"""Test configuration.

Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
without TPU hardware (SURVEY.md section 4).  Must set flags before jax import.
"""

import os

# Force, don't setdefault: the session environment exports JAX_PLATFORMS=axon
# (single real TPU chip via a tunnel); unit tests must be hermetic + fast.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon sitecustomize (PYTHONPATH=/root/.axon_site) registers the TPU
# plugin and overrides JAX_PLATFORMS at interpreter startup, so the env var
# alone is not enough; the config update below wins as long as it runs
# before the first backend use (pytest imports conftest before test modules).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
