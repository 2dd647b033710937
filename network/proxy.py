"""Shim: reference path `network.proxy` -> nerftex_tpu.ops.proxy."""
from nerftex_tpu.ops.proxy import AABB
