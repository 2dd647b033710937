"""Persistent XLA compilation cache for CLI/benchmark runs.

The instanced render graph takes minutes to compile on first trace; caching
compiled executables across processes makes reruns start in seconds.  Tests
configure their own cache (tests/conftest.py)."""

import os


def enable_compilation_cache(path: str = None) -> None:
    import jax

    if path is None:
        path = os.environ.get(
            "NERFTEX_COMPILE_CACHE", os.path.expanduser("~/.cache/nerftex_tpu/jax")
        )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def maybe_enable_debug_checks() -> None:
    """Opt-in numerics checking, the framework's analogue of the reference's
    tf.debugging.check_numerics calls (renderer.py:140-141):
    NERFTEX_DEBUG_NANS=1 makes jit de-optimize and raise on any NaN."""
    import jax

    if os.environ.get("NERFTEX_DEBUG_NANS"):
        jax.config.update("jax_debug_nans", True)
