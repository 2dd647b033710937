"""Train + render the REFERENCE (TF, /root/reference) on the paired dataset.

Runs the reference's real Train() (network/train.py:7-70) through its own
util.instantiate, exactly as its main.py does, on the shared synthetic
TFRecords; then restores the final checkpoint and renders the held-out
test poses with the reference renderer, saving per-image RGBA npz + PNGs.

Harness accommodations (environment, not behavior):
  * TF_USE_LEGACY_KERAS=1 (keras 3 cannot build the reference model).
  * tf.keras.utils.plot_model patched to a no-op (no pydot/graphviz here);
    it only writes a diagram PNG (train.py:37).

Usage: python scripts/paired/run_reference.py [--n-iters N] [--render-only]
(Run from anywhere; reference paths are injected. CPU-only, eager, slow.)
"""

import argparse
import importlib.util
import os
import sys

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")

_HERE = os.path.dirname(os.path.abspath(__file__))
_spec = importlib.util.spec_from_file_location("paired_common", os.path.join(_HERE, "common.py"))
common = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(common)

REFERENCE = "/root/reference"
TARGET = os.path.join(common.REPO, "logs", "paired_ref")
OUT = os.path.join(common.REPO, "logs", "paired_ref", "test_renders")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-iters", type=int, default=None)
    ap.add_argument("--render-only", action="store_true")
    args = ap.parse_args()

    # The reference resolves modules by name from its repo root; make sure
    # OUR shims (network/, util/, data/ at the repo root) cannot shadow it.
    sys.path = [REFERENCE] + [p for p in sys.path if os.path.abspath(p or ".") != common.REPO]
    os.chdir(REFERENCE)

    import numpy as np
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    tf.keras.utils.plot_model = lambda *a, **k: None  # no pydot on this box

    from util import util, EasyDict

    config = EasyDict(common.full_config(TARGET, n_iters=args.n_iters))

    # Mirror reference main.py seed handling.
    np.random.seed(config.seed)
    tf.random.set_seed(config.seed)
    os.makedirs(config.target_path, exist_ok=True)

    if not args.render_only:
        cfg = EasyDict(dict(config))
        util.instantiate(cfg)  # network.train.Train — blocks until done
        print("reference training done")

    # ---- render held-out poses with the reference renderer ---------------
    np.random.seed(config.seed)
    tf.random.set_seed(config.seed)

    test_ds = util.instantiate(EasyDict(common.test_dataset_config()))
    model = util.instantiate(EasyDict(common.model_config()))
    renderer_config = EasyDict(common.renderer_config())
    renderer_config.update(model)
    renderer = util.instantiate(renderer_config)

    ckpt = tf.train.Checkpoint(**model)
    ckpt_dir = os.path.join(TARGET, "checkpoints")
    latest = tf.train.latest_checkpoint(ckpt_dir)
    assert latest, f"no checkpoint under {ckpt_dir}"
    ckpt.restore(latest).expect_partial()
    print("restored", latest)

    os.makedirs(OUT, exist_ok=True)
    h, w = test_ds.height, test_ds.width
    for i, data in enumerate(test_ds):
        pred = renderer(
            **data,
            composite_bkgd=test_ds.composite_bkgd,
            bkgd_color=test_ds.bkgd_color,
            training=False,
        )
        rgb = np.asarray(pred["color_pred"]).reshape(h, w, 3)
        a = np.asarray(pred["alpha_pred"]).reshape(h, w)
        gt_rgb = np.asarray(data["color"]).reshape(h, w, 3)
        gt_a = np.asarray(data["alpha"]).reshape(h, w)
        np.savez(
            os.path.join(OUT, f"test_{i:02d}.npz"),
            color=rgb, alpha=a, gt_color=gt_rgb, gt_alpha=gt_a,
        )
        print(
            f"test_{i:02d}: psnr_rgb={common.psnr(rgb, gt_rgb):.2f} "
            f"psnr_a={common.psnr(a, gt_a):.2f}",
            flush=True,
        )
    print("reference renders ->", OUT)


if __name__ == "__main__":
    main()
