"""Shim: reference path `network.pixel_sampler` -> nerftex_tpu.data.pixel_sampler."""
from nerftex_tpu.data.pixel_sampler import Full, Independent, Proxy
