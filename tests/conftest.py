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

# The persistent cache stays OFF for XLA:CPU: AOT artifacts embed
# machine/XLA-option feature sets that differ across fleet hosts and
# compile services even when /proc/cpuinfo matches, and a mismatched
# load SIGILLs mid-run (observed killing whole suite runs).
jax.config.update("jax_enable_compilation_cache", False)
assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()


# XLA:CPU leaks compile-time memory across the suite's ~200 fused-program
# compilations; around the 180th compile the compiler segfaults (observed
# repeatedly at the same suite position on different test orderings).
# Dropping jax's executable/trace caches after every test MODULE keeps the
# process footprint bounded — modules re-compile their own geometries
# anyway, so the cost is small.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()
