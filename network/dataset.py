"""Shim: reference path `network.dataset` -> nerftex_tpu.data.dataset."""
from nerftex_tpu.data.dataset import (
    Dataset,
    TFRecord,
    FileFolder,
    GenerateData,
    RayDataset,
    ListSource,
)
from nerftex_tpu.data.dataset import look_at_np as look_at
