"""Shim: reference path `util.interpolate` -> nerftex_tpu.ops.interpolate."""
from nerftex_tpu.ops.interpolate import (
    interpolate_img,
    interpolate_nd,
    gaussian_kernel,
    filtered_downsample,
)
