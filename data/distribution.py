"""Shim: reference path `data.distribution` -> nerftex_tpu.data.distribution."""
from nerftex_tpu.data.distribution import (
    Distribution,
    Sphere,
    Hemisphere,
    AABB,
    Constant,
    Range,
    Concat,
)
