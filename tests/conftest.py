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


# ----------------------------------------------------------------------
# Quick tier (`pytest -m quick`): one or two smoke tests per subsystem so
# a sub-10-minute run still exercises every layer; the full suite remains
# the merge gate.  Selection is by nodeid substring so the source files
# stay marker-free.
_QUICK_PATTERNS = (
    # host-side subsystems (no XLA compile: seconds each)
    "test_bitstream.py::test_nal_wrap_split",
    "test_bitstream.py::test_expgolomb_roundtrip",
    "test_cavlc.py::test_residual_roundtrip_ac15",
    "test_cabac.py::test_decoder_matches_ffmpeg_on_x264_cabac_inter",
    "test_transform.py::test_idct_matches",
    "test_csp.py::test_rgb_roundtrip",
    "test_decoder_vs_ffmpeg.py::test_stock_medium",
    "test_decoder_vs_ffmpeg.py::test_b8x8_subpartitions",
    "test_decoder_vs_ffmpeg.py::test_high_i8x8_cabac",
    "test_decoder_vs_ffmpeg.py::test_weightp_explicit_fade",
    "test_decoder_vs_ffmpeg.py::test_multi_slice_cavlc",
    "test_config.py::test_preset_ladder_monotone_effort",
    "test_ratecontrol.py::test_crf_monotone_rate",
    "test_muxers.py::test_container_roundtrip",
    "test_params.py::",
    # device paths: ONE small fused-program compile (XLA:CPU compiles of
    # the large pipelines belong to the full suite; a sub-10-minute tier
    # cannot afford them)
    "test_tpu_encoder.py::test_i_frame_only",
    "test_device_pack.py::test_pack_slots_random",
)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "quick: fast cross-subsystem smoke tier (<10 min)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(pat in item.nodeid for pat in _QUICK_PATTERNS):
            item.add_marker(pytest.mark.quick)
