"""Test environment: run JAX on CPU with 8 virtual devices so multi-chip
sharding (Mesh/shard_map/psum) is exercised without TPU hardware.
Must run before anything imports jax."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Make the repo root importable regardless of pytest rootdir config.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
