"""Shim: reference path `network.logger` -> nerftex_tpu.render.logger."""
from nerftex_tpu.render.logger import Logger
