"""Process-wide RNG discipline.

The reference seeds numpy + TF globally (main.py:30-32) and then draws
implicitly everywhere.  Here the host side keeps the global numpy seed (the
distributions in data/ are host-side, matching the reference), while all
device-side randomness flows through explicit jax PRNG keys derived from one
base seed:  key = fold_in(base, stream_id) then fold_in(step).
"""

import numpy as np
import jax

_BASE_SEED = 0

# Stable stream ids for the framework's independent consumers.
STREAM_PERTURB = 1       # stratified-sample jitter (renderer.py:110)
STREAM_NOISE = 2         # raw_noise_std density noise (renderer.py:192)
STREAM_IMPORTANCE = 3    # sample_pdf's uniform draws (renderer.py:603)
STREAM_INSTANCER = 4     # instancer sample offsets + overlap selection
STREAM_FALSE_COLOR = 5   # per-instance debug colors (renderer.py:227)
STREAM_DATA = 6          # device-side data augmentation


def set_seed(seed: "int | None") -> None:
    """Set the global seed (numpy for host code, base key for device code)."""
    global _BASE_SEED
    if seed is None:
        return
    _BASE_SEED = int(seed)
    np.random.seed(seed)


def base_key() -> jax.Array:
    return jax.random.key(_BASE_SEED)


def stream_key(stream_id: int, step: int = 0) -> jax.Array:
    """Per-stream, per-step key; independent across streams and steps."""
    key = jax.random.fold_in(base_key(), stream_id)
    return jax.random.fold_in(key, step)
