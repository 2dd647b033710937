"""Quality check for the prefiltered (grass_filtered) pipeline: distance sweep.

For each camera radius in the demo sweep (20 -> 5, the reference's
config_grass_filtered_render.py:21-29 distribution), renders three ways:

  pf : the prefiltered path as shipped — blur_idx=0 routes cone_scale * t
       into the trained Blur conditioning (256x256).
  nf : the same render with the Blur conditioning pinned to 0 (no
       prefiltering; the model's sharpest output) (256x256).
  ss : supersampled "ground truth" — rendered at 512x512 with the blur path
       active and filtered-downsampled 2x by the Logger (the reference's own
       anti-aliasing mechanism, logger.py:129-130 / interpolate.py:78-82).

Reports PSNR(pf, ss) vs PSNR(nf, ss) per radius (premultiplied RGBA).  The
prefiltered path should track the supersampled reference at least as well as
the unfiltered one, increasingly so at distance.  Writes a sweep montage to
docs/grass_filtered_sweep.png.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/filtered_sweep.py
       (expects a trained checkpoint under logs/grass_filtered, i.e. after
        `python main.py configs/demo_grass_filtered_train.py`)
"""

import copy
import glob
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

import numpy as np

from nerftex_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from nerftex_tpu.utils import util
from nerftex_tpu.utils.util import EasyDict
from nerftex_tpu.utils.image import read_image, write_image


def render_variant(base, name, size, downsampling_factor=1, pin_blur=None, source="logs/grass_filtered"):
    cfg = copy.deepcopy(base)
    cfg["target_path"] = f"{source}_sweep/{name}"
    cfg["source_path"] = source
    cfg["test_dataset_config"]["data_loader_config"].update({"height": size, "width": size})
    cfg["logger_config"]["downsampling_factor"] = downsampling_factor
    if pin_blur is not None:
        # Zero the Blur constant but keep blur_idx: the per-sample scaling
        # (cone_scale * t / patch_scale) multiplies it, so the model (or the
        # mip cone radius) sees exactly pin_blur at every distance.  The mip
        # model requires the splice to stay on (it consumes 4 parameters).
        constants = cfg["test_dataset_config"]["data_loader_config"][
            "parameter_dist_config"
        ]["constants"]
        for c in constants:
            c[0] = pin_blur
    cfg = EasyDict(cfg)
    util.instantiate(cfg)
    paths = sorted(glob.glob(os.path.join(cfg["target_path"], "media/test/*.png")))
    return [read_image(p) for p in paths]


def psnr_premult(a, b):
    pa = np.concatenate([a[..., :3] * a[..., 3:], a[..., 3:]], -1).astype(np.float64)
    pb = np.concatenate([b[..., :3] * b[..., 3:], b[..., 3:]], -1).astype(np.float64)
    mse = ((pa - pb) ** 2).mean()
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def main():
    import argparse
    import importlib

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--variant", default="filtered", choices=["filtered", "mip"],
        help="filtered = blur_idx InstanceRenderer demo; mip = the trained "
             "IPE MipInstanceRenderer demo (configs/demo_grass_mip_*)",
    )
    args = ap.parse_args()
    config_name = (
        "demo_grass_filtered_render" if args.variant == "filtered" else "demo_grass_mip_render"
    )
    source = "logs/grass_filtered" if args.variant == "filtered" else "logs/grass_mip"

    base = copy.deepcopy(importlib.import_module(f"configs.{config_name}").config)
    base["module"] = "network.render.Render"

    pf = render_variant(base, "pf", 256, source=source)
    nf = render_variant(base, "nf", 256, pin_blur=0.0, source=source)
    ss = render_variant(base, "ss", 512, downsampling_factor=2, source=source)

    radii = np.linspace(20, 5, len(pf))
    print(f"{'radius':>8} {'PSNR(pf,ss)':>12} {'PSNR(nf,ss)':>12} {'prefilter gain':>15}")
    rows = []
    for r, a, b, s in zip(radii, pf, nf, ss):
        p_pf, p_nf = psnr_premult(a, s), psnr_premult(b, s)
        rows.append((r, p_pf, p_nf))
        print(f"{r:8.1f} {p_pf:12.2f} {p_nf:12.2f} {p_pf - p_nf:15.2f}")

    # Montage: top row = prefiltered sweep, bottom = supersampled reference.
    top = np.concatenate(pf, axis=1)
    bot = np.concatenate(ss, axis=1)
    out_png = f"docs/grass_{args.variant}_sweep.png"
    write_image(out_png, np.concatenate([top, bot], axis=0))
    print(f"montage -> {out_png}")


if __name__ == "__main__":
    main()
