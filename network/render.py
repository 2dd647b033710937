"""Shim: reference path `network.render` -> nerftex_tpu.render.render."""
from nerftex_tpu.render.render import Render
