"""Shim: reference path `data.create_dataset` -> nerftex_tpu.tools.create_dataset."""
from nerftex_tpu.tools.create_dataset import render_views, main

if __name__ == "__main__":
    main()
