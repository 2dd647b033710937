"""CLI entry point: load a config module and run its top-level driver.

Usage (identical to the reference, main.py:12-49):
    python main.py configs/config_carpet_train.py
"""

import argparse
import importlib
import os
import shutil

from nerftex_tpu.utils import util, rng
from nerftex_tpu.utils.util import EasyDict
from nerftex_tpu.utils.cache import enable_compilation_cache, maybe_enable_debug_checks


def main() -> None:
    enable_compilation_cache()
    maybe_enable_debug_checks()

    import sys

    if os.getcwd() not in sys.path:
        sys.path.insert(0, os.getcwd())
    parser = argparse.ArgumentParser(description="Run the pipeline described by a config file.")
    parser.add_argument("config", help="Path to config file.")
    args = parser.parse_args()

    config_path = args.config[:-3] if args.config.endswith(".py") else args.config
    config_module = config_path.replace("/", ".")

    config = EasyDict(importlib.import_module(config_module).config)

    # Forward the full config (minus the logger's own) to the logger for
    # experiment bookkeeping (reference main.py:24-27).
    config_copy = EasyDict(config)
    if "logger_config" in config_copy:
        del config_copy.logger_config
        config.logger_config.update({"info": config_copy})

    rng.set_seed(config.get("seed"))

    os.makedirs(config.target_path, exist_ok=config.get("override", False))
    infix = "train" if "train" in config.module else "render"
    config_copy_path = os.path.join(config.target_path, "config_" + infix + ".py")
    try:
        shutil.copy(config_path + ".py", config_copy_path)
    except shutil.SameFileError:
        pass

    with open(config_copy_path, "a") as f:
        f.write("\n# GIT COMMIT HASH: " + util.get_git_hash())

    util.instantiate(config)


if __name__ == "__main__":
    main()
