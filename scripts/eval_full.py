"""Held-out PSNR eval for the full-scale carpet run (VERDICT r2 item 2).

Renders N held-out 512^2 analytic swatch views (synth seed != the training
set's) with the checkpoint trained by configs/full_carpet_train.py through
the plain Renderer path, and reports straight-alpha RGB / alpha PSNR vs the
analytic ground truth.  Mirrors scripts/paired/run_ours.py's render loop but
at the reference's as-shipped scale (512^2, 5000-view training set, 500k
iters; reference configs/config_carpet_train.py:23,33).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/eval_full.py \
           [--n-views 8] [--logdir logs/carpet_full]
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

import numpy as np

TEST_TFR = os.path.join("datasets", "materials", "carpet_full", "tfr", "test.tfr")


def psnr(a, b):
    mse = float(((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2).mean())
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-views", type=int, default=8)
    ap.add_argument("--logdir", default=os.path.join("logs", "carpet_full"))
    ap.add_argument("--out", default=None, help="optional dir for pred/gt npz + pngs")
    args = ap.parse_args()

    from nerftex_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if not os.path.exists(TEST_TFR):
        from nerftex_tpu.tools.synth import make_synthetic_tfrecord

        print(f"generating {args.n_views} held-out 512^2 views (seed=1) ...")
        make_synthetic_tfrecord(
            TEST_TFR, n_images=args.n_views, size=512, n_parameters=(1, 6),
            seed=1, backend="jax",
        )

    import jax

    import nerftex_tpu.models.mlp as mlp_mod
    from nerftex_tpu.render.checkpoint import CheckpointManager
    from nerftex_tpu.utils import rng, util
    from nerftex_tpu.utils.util import EasyDict

    from configs.full_carpet_train import config as train_cfg

    rng.set_seed(train_cfg["seed"])
    np.random.seed(train_cfg["seed"])
    mlp_mod._INIT_COUNTER[0] = 0

    # Held-out dataset: the training config's dataset with a Full pixel
    # sampler over the seed-1 TFRecord.
    ds_cfg = EasyDict(
        {
            "module": "network.dataset.Dataset",
            "data_loader_config": {
                "module": "network.dataset.TFRecord",
                "tfr_path": TEST_TFR,
            },
            "pixel_sampler_config": {"module": "network.pixel_sampler.Full"},
            "ray_sampler_config": {"module": "network.ray_sampler.Proxy"},
            "proxy_config": train_cfg["train_dataset_config"]["proxy_config"],
            "n_epochs": 1,
        }
    )
    test_ds = util.instantiate(ds_cfg)

    model_config = EasyDict(dict(train_cfg["model_config"]))
    model_config.setdefault("n_parameters", test_ds.n_parameters)
    models = util.instantiate(model_config)

    renderer_config = EasyDict(dict(train_cfg["renderer_config"]))
    renderer_config.update(models)
    renderer = util.instantiate(renderer_config)

    mgr = CheckpointManager(os.path.join(args.logdir, "checkpoints"))
    saved = mgr.restore_latest()
    assert saved is not None, f"no checkpoint under {args.logdir}/checkpoints"
    for name, model in models.items():
        model.params = saved["models"][name]
    print(f"restored step {saved['extra']['step']} from {args.logdir}")

    h, w = test_ds.height, test_ds.width
    ps_rgb, ps_a = [], []
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
        p_rgb, p_a = psnr(rgb, gt_rgb), psnr(a, gt_a)
        ps_rgb.append(p_rgb)
        ps_a.append(p_a)
        print(f"view {i}: psnr_rgb={p_rgb:.2f} dB  psnr_alpha={p_a:.2f} dB", flush=True)
        if args.out:
            os.makedirs(args.out, exist_ok=True)
            np.savez(
                os.path.join(args.out, f"view_{i:02d}.npz"),
                color=rgb.astype(np.float16), alpha=a.astype(np.float16),
                gt_color=gt_rgb.astype(np.float16), gt_alpha=gt_a.astype(np.float16),
            )

    print(
        f"\nheld-out ({len(ps_rgb)} views @ {h}x{w}): "
        f"rgb {np.mean(ps_rgb):.2f} ± {np.std(ps_rgb):.2f} dB "
        f"(min {np.min(ps_rgb):.2f}, max {np.max(ps_rgb):.2f}); "
        f"alpha {np.mean(ps_a):.2f} dB"
    )


if __name__ == "__main__":
    main()
