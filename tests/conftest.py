"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding paths are validated on a virtual CPU mesh (no pod
available); the real-TPU benchmark path is exercised by bench.py.

The image's sitecustomize exports JAX_PLATFORMS=axon (a real-TPU tunnel) and
pytest plugins may import jax before this conftest runs, so setting the env
var alone is not enough — jax.config.update works as long as no backend has
been initialized yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache (same idea as bench.py): repeated test runs skip
# the expensive XLA compiles of the fused per-geometry encoder programs.
# Keyed per host CPU: XLA:CPU AOT executables are machine-feature-specific
# and loading another machine's artifacts risks SIGILL.
import hashlib
import platform

_host = hashlib.sha1((platform.processor() + platform.machine()
                      + platform.node()).encode()).hexdigest()[:10]
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache",
                      f"cpu-{_host}"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()
