"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding paths are validated on a virtual CPU mesh (no pod
available); the real-TPU benchmark path is exercised by bench.py.
Must run before any jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
