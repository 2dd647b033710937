"""Train + render THIS framework on the paired dataset (same spec as
run_reference.py: same TFRecords, model dims, loss, sampler counts, iters).

Trains through the framework's real Train() (the reference-schema config
resolved by util.instantiate, exactly like main.py), then restores the final
checkpoint and renders the held-out test poses, saving per-image npz.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/paired/run_ours.py \
           [--n-iters N] [--render-only] [--target logs/paired_ours]
"""

import argparse
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(_HERE)))

import numpy as np

import common


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-iters", type=int, default=None)
    ap.add_argument("--render-only", action="store_true")
    ap.add_argument("--target", default=os.path.join(common.REPO, "logs", "paired_ours"))
    ap.add_argument("--seed", type=int, default=None)
    args = ap.parse_args()

    from nerftex_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from nerftex_tpu.utils import util, rng
    from nerftex_tpu.utils.util import EasyDict

    spec = dict(common.SPEC)
    if args.seed is not None:
        spec["seed"] = args.seed
    config = EasyDict(common.full_config(args.target, spec=spec, n_iters=args.n_iters))

    rng.set_seed(config.seed)
    np.random.seed(config.seed)
    os.makedirs(config.target_path, exist_ok=True)

    if not args.render_only:
        cfg = EasyDict(dict(config))
        util.instantiate(cfg)  # network.train.Train (ours)
        print("framework training done")

    # ---- render held-out poses -------------------------------------------
    import jax
    import nerftex_tpu.models.mlp as mlp_mod
    from nerftex_tpu.render.checkpoint import CheckpointManager

    rng.set_seed(config.seed)
    mlp_mod._INIT_COUNTER[0] = 0

    test_ds = util.instantiate(EasyDict(common.test_dataset_config()))
    model_config = EasyDict(common.model_config(spec))
    model_config.setdefault("n_parameters", test_ds.n_parameters)
    models = util.instantiate(model_config)
    renderer_config = EasyDict(common.renderer_config(spec))
    renderer_config.update(models)
    renderer = util.instantiate(renderer_config)

    saved = CheckpointManager(os.path.join(args.target, "checkpoints")).restore_latest()
    assert saved is not None, f"no checkpoint under {args.target}/checkpoints"
    for name, model in models.items():
        model.params = saved["models"][name]
    print(f"restored step {saved['extra']['step']}")

    out_dir = os.path.join(args.target, "test_renders")
    os.makedirs(out_dir, exist_ok=True)
    h, w = test_ds.height, test_ds.width
    for i, data in enumerate(test_ds):
        pred = renderer(
            **data,
            composite_bkgd=test_ds.composite_bkgd,
            bkgd_color=test_ds.bkgd_color,
            training=False,
            key=jax.random.key(0),
        )
        rgb = np.asarray(pred["color_pred"]).reshape(h, w, 3)
        a = np.asarray(pred["alpha_pred"]).reshape(h, w)
        gt_rgb = np.asarray(data["color"]).reshape(h, w, 3)
        gt_a = np.asarray(data["alpha"]).reshape(h, w)
        np.savez(
            os.path.join(out_dir, f"test_{i:02d}.npz"),
            color=rgb, alpha=a, gt_color=gt_rgb, gt_alpha=gt_a,
        )
        print(
            f"test_{i:02d}: psnr_rgb={common.psnr(rgb, gt_rgb):.2f} "
            f"psnr_a={common.psnr(a, gt_a):.2f}",
            flush=True,
        )
    print("framework renders ->", out_dir)


if __name__ == "__main__":
    main()
