"""Shim: reference path `data.nerf2tfr` -> nerftex_tpu.tools.nerf2tfr."""
from nerftex_tpu.tools.nerf2tfr import convert, main

if __name__ == "__main__":
    main()
