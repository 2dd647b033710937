"""Test environment: run JAX on CPU with 8 virtual devices so multi-chip
sharding (Mesh/shard_map/psum) is exercised without TPU hardware.
Must run before anything imports jax."""

import os
import sys

# Override unconditionally: the environment pins JAX_PLATFORMS=axon (TPU
# tunnel), but tests need the 8-virtual-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Make the repo root importable regardless of pytest rootdir config.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache: this box has one CPU core, so re-compiles
# dominate test time without it.
import jax

# sitecustomize imports jax before this file runs, so the env vars above are
# too late for config defaults — override through the config API.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
