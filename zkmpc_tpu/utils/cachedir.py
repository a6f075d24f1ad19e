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
    # two VMs can show IDENTICAL cpuinfo yet LLVM detects different target
    # features (+prefer-no-scatter etc.), and loading the other VM's AOT
    # artifact SIGILLs/segfaults — key the cache per machine instance
    for mid in ("/etc/machine-id", "/proc/sys/kernel/random/boot_id"):
        try:
            with open(mid) as f:
                h.update(f.read().encode())
        except OSError:
            continue
    return h.hexdigest()[:12]


def cache_dir() -> str:
    return os.path.expanduser(f"~/.cache/jax_zkmpc_{host_fingerprint()}")


def configure(jax) -> str | None:
    """Point jax's persistent compilation cache at the host-keyed dir.

    TPU only: XLA:CPU's AOT deserializer segfaults loading its own
    artifacts (observed crashing in `compilation_cache.get_executable_and_
    time` on an entry written seconds earlier by the same process), so on
    CPU the persistent cache is DISABLED — the scan-formulated graphs
    compile in seconds there anyway."""
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "cpu"
    if backend != "tpu":
        return None
    d = cache_dir()
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return d
