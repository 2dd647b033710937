"""Shim: reference path `network.model` -> nerftex_tpu.models.mlp.

Note: the reference's configs reach encodings as `network.model.FourierFeatures`
via a star-import (reference network/model.py:7); re-export them here too.
"""
from nerftex_tpu.models.mlp import Nerf, ParamNerf, CoarseFine, Model
from nerftex_tpu.models.encodings import FourierFeatures, IntegratedPositionalEncoding
