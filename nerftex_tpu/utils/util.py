"""Config runtime: reflection-based instantiation + attribute dicts.

The whole framework is driven by nested ``{'module': 'pkg.mod.Attr', **kwargs}``
dicts, exactly like the reference (util/util.py:8-54).  Configs written for the
reference resolve unchanged because the repo ships shim packages (``network``,
``instancer``, ``data``, ``util``) that re-export the TPU-native
implementations under the reference's module paths.
"""

from typing import Any
import importlib
import math
import subprocess


# -- reflection -------------------------------------------------------------

def get_attr_from_module(module_name: str, attr_name: str) -> Any:
    module = importlib.import_module(module_name)
    return getattr(module, attr_name)


def get_attr_from_path(path: str) -> Any:
    """Resolve a dotted ``pkg.mod.Attr`` path to the attribute."""
    module_name, _, attr_name = path.rpartition(".")
    return get_attr_from_module(module_name, attr_name)


def instantiate(config: "EasyDict | dict | None") -> Any:
    """Instantiate/evaluate the target named by ``config['module']`` with the
    remaining keys as kwargs (reference util/util.py:44-54)."""
    if config is None:
        return None

    args = EasyDict(config)
    target = args.module
    del args.module

    return get_attr_from_path(target)(**args)


# -- attribute dict ---------------------------------------------------------

class EasyDict(dict):
    """dict subclass with attribute access; recursively wraps nested dicts."""

    def __init__(self, other: dict = ()) -> None:
        super().__init__()
        for key in other:
            value = other[key]
            if isinstance(value, dict) and not isinstance(value, EasyDict):
                value = EasyDict(value)
            self[key] = value

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError:
            raise AttributeError(key)

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __delattr__(self, key: str) -> None:
        del self[key]


# -- misc -------------------------------------------------------------------

def format_name(prefix: str, idx: int, max_idx: int, suffix: str) -> str:
    """Zero-pad ``idx`` wide enough to fit ``max_idx`` (util/util.py:56-62)."""
    n_chars = max(1, math.ceil(math.log10(max_idx + 1)))
    return prefix + ("{:0" + str(n_chars) + "d}").format(idx) + suffix


def get_git_hash() -> str:
    try:
        return (
            subprocess.check_output(["git", "rev-parse", "--short", "HEAD"])
            .strip()
            .decode("utf-8")
        )
    except Exception:
        return "unknown"
