"""Shim: reference path `data.sampler` -> nerftex_tpu.data.sampler."""
from nerftex_tpu.data.sampler import (
    Sampler,
    Independent,
    Constant,
    Grid,
    Stratified,
    Concat,
)
