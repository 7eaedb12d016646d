"""Persistent XLA compilation cache setup (shared by CLI/API entry points).

Keyed per backend + host CPU: XLA:CPU AOT executables are machine-feature-
specific, and loading another machine's artifacts risks SIGILL (observed:
"Target machine feature +prefer-no-gather is not supported on the host
machine" when machines sharing a network volume collide on the key).
platform.node()/processor() are NOT unique across fleet hosts, so the key
hashes the actual CPU model + feature flags from /proc/cpuinfo.
"""

from __future__ import annotations

import hashlib
import os
import platform

_done = False


def host_key() -> str:
    """Hash of the host's CPU identity (model + ISA feature flags)."""
    ident = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    ident.append(line.strip())
                    if len(ident) >= 3:
                        break
    except OSError:
        ident.append(platform.processor() + platform.node())
    return hashlib.sha1("|".join(ident).encode()).hexdigest()[:10]


def enable_compilation_cache(root: str | None = None) -> None:
    global _done
    if _done:
        return
    _done = True
    import jax
    plat = jax.default_backend()
    if plat == "cpu":
        # XLA:CPU AOT artifacts do not reload safely: executables embed
        # machine/XLA-option feature sets that differ across fleet hosts
        # and compile services even when /proc/cpuinfo matches, and a
        # mismatched load SIGILLs mid-run.  Cache TPU programs only.
        jax.config.update("jax_enable_compilation_cache", False)
        return
    # include the device count: XLA:CPU executables are specialized to the
    # host-platform device topology, and loading an artifact built for a
    # different count (e.g. the test suite's 8 virtual devices vs the
    # CLI's 1) can crash on deserialization
    n = jax.device_count()
    base = root or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(base, f"{plat}{n}-{host_key()}"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
