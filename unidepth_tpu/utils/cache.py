"""Persistent-compile-cache location, keyed by a host fingerprint.

XLA:CPU stores AOT-compiled host machine code whose cache key does NOT
cover the exact host ISA: after a container migration, loading an entry
compiled on the previous host executes wrong-machine code and aborts the
process mid-run (observed as a silent SIGABRT with "Machine type used for
XLA:CPU compilation doesn't match the machine type for execution").
cpuinfo flags alone proved insufficient as a key (one migration reproduced
the abort with an identical flags line), so the boot id is folded in: any
reboot/migration gets a fresh cache dir, while repeated runs within one
boot — the case the cache exists for — share it. TPU entries are keyed the
same way; they only cost a recompile after migration.
"""

from __future__ import annotations

import hashlib

__all__ = ["compile_cache_dir", "setup_compile_cache"]

_ROOT = "/root/.jax_cache"


def _host_fingerprint() -> str:
    parts = []
    for path in ("/proc/cpuinfo", "/proc/sys/kernel/random/boot_id"):
        try:
            with open(path) as f:
                if path.endswith("cpuinfo"):
                    parts.extend(
                        line for line in f if line.startswith(("flags", "model name"))
                    )
                else:
                    parts.append(f.read())
        except OSError:
            pass
    if not parts:
        import platform

        parts = [platform.processor()]
    return hashlib.sha256("".join(parts).encode()).hexdigest()[:12]


def compile_cache_dir() -> str:
    return f"{_ROOT}/{_host_fingerprint()}"


def setup_compile_cache(jax, min_compile_secs: float = 2.0) -> None:
    """Point jax's persistent compile cache at the host-keyed directory."""
    jax.config.update("jax_compilation_cache_dir", compile_cache_dir())
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )
