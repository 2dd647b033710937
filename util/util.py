"""Shim: reference path `util.util` -> nerftex_tpu.utils.util."""
from nerftex_tpu.utils.util import (
    EasyDict,
    get_attr_from_module,
    get_attr_from_path,
    instantiate,
    format_name,
    get_git_hash,
)
