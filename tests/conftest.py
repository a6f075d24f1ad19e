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
# of small limb kernels), so cache across runs.  The cache dir is keyed by a
# host fingerprint (model + flags + jaxlib version) — XLA:CPU AOT results
# compiled for a different microarchitecture SEGFAULT when loaded; see
# zkmpc_tpu/utils/cachedir.py for the observed failure mode.
from zkmpc_tpu.utils import cachedir as _cachedir  # noqa: E402

_cachedir.configure(jax)

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """XLA:CPU's compiler segfaults deep into long single-process runs
    (observed twice at the 30th test; the same test passes standalone), so
    shed accumulated live executables / tracing caches between modules.
    The persistent on-disk cache keeps recompiles cheap."""
    yield
    jax.clear_caches()
    gc.collect()
