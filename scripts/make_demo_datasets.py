"""Regenerate every dataset the shipped/demo configs reference.

`datasets/` is gitignored (generated data), so a fresh checkout has none of
the TFRecords the configs point at.  This script rebuilds all of them
deterministically:

  * carpet / fur / grass / plush train swatches -> synth.make_synthetic_tfrecord
    (the analytic stand-in for the Blender toolchain, tools/synth.py), with
    each material's n_parameters layout from its train config.
  * grass_filtered -> the REAL offline toolchain end to end, mirroring the
    reference recipe (README.md:27-32 of /root/reference):
        create_dataset (analytic backend, data/configs/config_grass_filtered_src.py)
        -> tools/blur.py  (sigma ~ truncated-exp, 'Blur' prepended as param 0)
        -> tools/nerf2tfr (folder -> TFRecord)
  * paired/  -> the reference-vs-framework PSNR experiment inputs
    (scripts/paired/common.py spec: 48 train / 8 test views at 96x96).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/make_demo_datasets.py \
           [--only carpet,grass_filtered,...] [--force]
"""

import argparse
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

from nerftex_tpu.tools.synth import make_synthetic_tfrecord

# material -> (n_parameters, n_images, size, seed); layouts match the train
# configs (configs/config_*_train.py) and the reference's parameter counts.
SYNTH_MATERIALS = {
    "carpet": ((1, 6), 96, 96, 0),
    "fur": ((1, 4), 64, 96, 1),
    "grass": ((1, 4), 96, 96, 2),
    "plush": ((1, 4), 96, 96, 3),
}

MAX_SIGMA = 10.0  # blur range for the prefiltered set (README.md:36-38)


def make_synth(name, force):
    n_parameters, n_images, size, seed = SYNTH_MATERIALS[name]
    out = os.path.join("datasets", "materials", name, "tfr", "train.tfr")
    if os.path.exists(out) and not force:
        print(f"[skip] {out} exists")
        return
    make_synthetic_tfrecord(
        out, n_images=n_images, size=size, n_parameters=n_parameters, seed=seed
    )
    print(f"[done] {out} ({n_images} views @ {size}px, n_parameters={list(n_parameters)})")


def make_grass_filtered(force):
    src = os.path.join("datasets", "materials", "grass_filtered_src")
    blurred = os.path.join("datasets", "materials", "grass_filtered", "blurred")
    out = os.path.join("datasets", "materials", "grass_filtered", "tfr", "filtered.tfr")
    if os.path.exists(out) and not force:
        print(f"[skip] {out} exists")
        return
    for path in (src, blurred):
        if os.path.exists(path):
            shutil.rmtree(path)

    import importlib

    from nerftex_tpu.tools import blur, create_dataset, nerf2tfr
    from nerftex_tpu.utils.util import EasyDict

    cfg = EasyDict(importlib.import_module("data.configs.config_grass_filtered_src").config)
    create_dataset.render_views(cfg, backend="analytic")
    print(f"[done] {src} (analytic create_dataset)")

    blur.process(src, blurred, subsets=("train",), max_sigma=MAX_SIGMA, dataset_size_increase=2)
    print(f"[done] {blurred} (blur, max_sigma={MAX_SIGMA}, 2x size increase)")

    for path in nerf2tfr.convert(blurred, out, "train", False, 0, None):
        print(f"[done] {path}")


def make_carpet_full(force):
    """Full-scale carpet dataset: 5000 views at 512^2 (the reference's
    as-shipped scale, data/configs/config_carpet.py: 5000 views, 512px).
    Rendered on the default JAX device (TPU) — the host integrator would
    take hours at this size; PNG encoding still dominates (~15 min)."""
    out = os.path.join("datasets", "materials", "carpet_full", "tfr", "train.tfr")
    if os.path.exists(out.replace(".tfr", ".tfr-00000-of-00050")) and not force:
        print("[skip] datasets/materials/carpet_full exists")
        return
    make_synthetic_tfrecord(
        out, n_images=5000, size=512, n_parameters=(1, 6), seed=0,
        backend="jax", imgs_per_shard=100, progress_every=250,
    )
    print(f"[done] {out} (5000 views @ 512px, 50 shards)")


def make_paired(force):
    train = os.path.join("datasets", "paired", "train.tfr")
    test = os.path.join("datasets", "paired", "test.tfr")
    if os.path.exists(train) and os.path.exists(test) and not force:
        print("[skip] datasets/paired exists")
        return
    make_synthetic_tfrecord(train, n_images=48, size=96, seed=0)
    make_synthetic_tfrecord(test, n_images=8, size=96, seed=1)
    print(f"[done] {train} (48 views), {test} (8 views)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, help="comma-separated subset of: "
                    + ",".join(list(SYNTH_MATERIALS) + ["grass_filtered", "paired", "carpet_full"]))
    ap.add_argument("--force", action="store_true", help="regenerate even if present")
    args = ap.parse_args()

    targets = args.only.split(",") if args.only else list(SYNTH_MATERIALS) + [
        "grass_filtered", "paired"
    ]  # carpet_full (5000 x 512^2, ~20 min on the chip) is opt-in via --only
    for name in targets:
        if name in SYNTH_MATERIALS:
            make_synth(name, args.force)
        elif name == "grass_filtered":
            make_grass_filtered(args.force)
        elif name == "paired":
            make_paired(args.force)
        elif name == "carpet_full":
            make_carpet_full(args.force)
        else:
            raise SystemExit(f"unknown dataset {name!r}")


if __name__ == "__main__":
    main()
