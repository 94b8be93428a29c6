"""Test config: force CPU backend with 8 virtual devices so multi-chip sharding
is exercised without TPU hardware.

Note: this environment's sitecustomize imports jax at interpreter start with
JAX_PLATFORMS=axon, so the env var alone is too late — we must also flip the
config. XLA_FLAGS is still honored because the CPU client initializes lazily.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: xdist workers each compile the same programs;
# cache hits cut the suite from >30 min to minutes on warm runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ctl_tests")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
