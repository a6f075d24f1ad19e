"""Host-keyed persistent-compile-cache location.

XLA:CPU stores AOT-compiled machine code in the persistent cache; loading an
artifact compiled for a different microarchitecture SIGSEGVs (observed:
`cpu_aot_loader` "+prefer-no-scatter not supported on the host machine"
followed by a hard crash inside the jitted kernel).  LLVM picks its target
attributes from the host CPU *model*, not just the cpuid feature flags — two
machines with identical /proc/cpuinfo `flags` lines can still produce
incompatible artifacts — so the cache key includes the model name, the
flags, and the jaxlib version.
"""

from __future__ import annotations

import hashlib
import os


def host_fingerprint() -> str:
    h = hashlib.sha1()
    try:
        import jaxlib
        h.update(getattr(jaxlib, "__version__", "?").encode())
    except ImportError:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "model name", "microcode")):
                    h.update(line.encode())
                    if line.startswith("microcode"):
                        break
    except OSError:
        import platform
        h.update(platform.processor().encode())
    return h.hexdigest()[:12]


def cache_dir() -> str:
    return os.path.expanduser(f"~/.cache/jax_zkmpc_{host_fingerprint()}")


def configure(jax) -> str:
    """Point jax's persistent compilation cache at the host-keyed dir."""
    d = cache_dir()
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return d
