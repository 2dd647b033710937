"""Shim: reference path `instancer.instancer` -> nerftex_tpu.instancing."""
from nerftex_tpu.instancing.instancer import Instancer
