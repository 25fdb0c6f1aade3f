"""Host-fingerprinted JAX persistent-cache directories.

XLA:CPU persistent-cache entries are AOT results tagged with the compiling
host's CPU features; loading them on a host with different features fails
("Target machine feature ... is not supported") and every compile falls
back to cold (the round-4 multichip-dryrun timeout).  Fingerprinting the
cache directory by the host's CPU feature set makes a foreign cache
invisible instead of poisonous: each host warms (and reuses) its own
subdirectory.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _cpu_fingerprint() -> str:
    bits = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    bits.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        pass
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:12]


def cpu_cache_dir(root: str = "/root/repo") -> str:
    """Per-host CPU compile-cache directory (created if missing)."""
    d = os.path.join(root, ".jax_cache_cpu", _cpu_fingerprint())
    os.makedirs(d, exist_ok=True)
    return d


def enable_cpu_cache(jax_module, root: str = "/root/repo") -> None:
    try:
        jax_module.config.update("jax_compilation_cache_dir",
                                 cpu_cache_dir(root))
        jax_module.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.5)
    except (RuntimeError, OSError):
        pass
