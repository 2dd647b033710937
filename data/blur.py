"""Shim: reference path `data.blur` -> nerftex_tpu.tools.blur."""
from nerftex_tpu.tools.blur import process, blur_png, inv_cdf, main

if __name__ == "__main__":
    main()
