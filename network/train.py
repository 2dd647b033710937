"""Shim: reference path `network.train` -> nerftex_tpu.render.train."""
from nerftex_tpu.render.train import Train, TrainState, make_optimizer, make_train_step
