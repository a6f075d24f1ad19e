"""Test configuration: force CPU with 8 virtual devices so multi-party mesh
code paths (jax.sharding over a 'parties' axis) are exercised without TPU pods.
Must run before jax is imported anywhere."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone is not enough when a higher-priority PJRT plugin (e.g. the
# axon TPU tunnel) is installed; force the platform through the config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the test suite is compile-dominated (hundreds
# of small limb kernels), so cache across runs.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_zkmpc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
