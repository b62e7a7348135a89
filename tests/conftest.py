"""Test config: force CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (SURVEY §4: the JAX-native
replacement for the reference's absent distributed test harness)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache makes repeated test runs cheap; repo-local so a
# fresh container (wiped /tmp) still starts warm — see bench.py for why
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("TVI_JAX_CACHE",
                   os.path.join(os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))), ".jax_cache", "cpu")))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
