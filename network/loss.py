"""Shim: reference path `network.loss` -> nerftex_tpu.render.loss."""
from nerftex_tpu.render.loss import NerfLoss, AlphaLoss, mse, smape
