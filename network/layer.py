"""Shim: reference path `network.layer` -> nerftex_tpu.models.encodings."""
from nerftex_tpu.models.encodings import (
    FourierFeatures,
    IntegratedPositionalEncoding,
    expected_sin,
)
