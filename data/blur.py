"""Shim: reference path `data.blur` -> nerftex_tpu.tools.blur."""
import os, sys

# Allow `python data/<tool>.py` from a bare checkout: the repo root (one
# level up) must be importable for the nerftex_tpu package and configs.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

from nerftex_tpu.tools.blur import process, blur_png, inv_cdf, main

if __name__ == "__main__":
    main()
