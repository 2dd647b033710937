"""Shim package: reference-compatible module paths (`util.util`, `util.EasyDict`)
re-exported from the TPU-native core in nerftex_tpu/."""
from nerftex_tpu.utils.util import EasyDict
from util import util, interpolate
