"""Persistent XLA compilation cache setup (shared by CLI/API entry points).

Keyed per backend + host: XLA:CPU AOT executables are machine-feature-
specific, and loading another machine's artifacts risks SIGILL.
"""

from __future__ import annotations

import hashlib
import os
import platform

_done = False


def enable_compilation_cache(root: str | None = None) -> None:
    global _done
    if _done:
        return
    _done = True
    import jax
    host = hashlib.sha1((platform.processor() + platform.machine()
                         + platform.node()).encode()).hexdigest()[:10]
    plat = jax.default_backend()
    # include the device count: XLA:CPU executables are specialized to the
    # host-platform device topology, and loading an artifact built for a
    # different count (e.g. the test suite's 8 virtual devices vs the
    # CLI's 1) can crash on deserialization
    n = jax.device_count()
    base = root or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(base, f"{plat}{n}-{host}"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
