"""Shim package: reference-compatible `network.*` module paths re-exported
from the TPU-native core in nerftex_tpu/."""
