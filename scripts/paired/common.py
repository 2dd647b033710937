"""Shared spec for the paired reference-vs-framework PSNR experiment.

Both runners (run_reference.py on the TF/CPU reference, run_ours.py on this
framework) train the SAME model dims on the SAME TFRecord files and render
the SAME held-out poses; compare.py reports PSNR vs ground truth and the
cross-framework gap (BASELINE.md north star: within 0.1 dB).

The config is the reference's carpet-train schema
(/root/reference/configs/config_carpet_train.py:15-112) with the dataset
swapped for the analytic swatch TFRecords (tools/synth.py) and n_iters
reduced so the eager TF reference finishes on this 1-core CPU.
"""

import os

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRAIN_TFR = os.path.join(REPO, "datasets/paired/train.tfr")
TEST_TFR = os.path.join(REPO, "datasets/paired/test.tfr")

# Synth swatch bounds (tools/synth.py defaults).
B_0 = [-1.5, -1.3, -0.2]
B_1 = [1.3, 1.3, 1.9]

SPEC = dict(
    n_iters=2000,
    lrate=5e-4,
    lrate_decay=500,          # same semantic as the reference: decay_steps = 500e3
    batchsize=4,
    rays_per_image=256,
    n_samples=128,            # samples per ray
    depth=8,
    width=256,
    n_parameters=[1, 6],
    pos_freq=10,
    dir_freq=4,
    param_freq=4,
    seed=0,
)


def train_dataset_config(spec=SPEC):
    return {
        "module": "network.dataset.Dataset",
        "data_loader_config": {
            "module": "network.dataset.TFRecord",
            "tfr_path": TRAIN_TFR,
        },
        "pixel_sampler_config": {
            "module": "network.pixel_sampler.Proxy",
            "n_samples": spec["rays_per_image"],
        },
        "ray_sampler_config": {"module": "network.ray_sampler.Proxy"},
        "proxy_config": {"module": "network.proxy.AABB", "b_0": B_0, "b_1": B_1},
        "batchsize": spec["batchsize"],
        "shuffle_buffer_size": 48,
    }


def test_dataset_config():
    """Held-out poses, full-image pixel sampler (for rendering)."""
    return {
        "module": "network.dataset.Dataset",
        "data_loader_config": {
            "module": "network.dataset.TFRecord",
            "tfr_path": TEST_TFR,
        },
        "pixel_sampler_config": {"module": "network.pixel_sampler.Full"},
        "ray_sampler_config": {"module": "network.ray_sampler.Proxy"},
        "proxy_config": {"module": "network.proxy.AABB", "b_0": B_0, "b_1": B_1},
        "n_epochs": 1,
    }


def model_config(spec=SPEC):
    return {
        "module": "network.model.ParamNerf",
        "pos_embedding": {
            "module": "network.model.FourierFeatures",
            "n_freq_bands": spec["pos_freq"],
        },
        "dir_embedding": {
            "module": "network.model.FourierFeatures",
            "n_freq_bands": spec["dir_freq"],
        },
        "param_embedding": {
            "module": "network.model.FourierFeatures",
            "n_freq_bands": spec["param_freq"],
        },
        "n_parameters": spec["n_parameters"],
        "depth": spec["depth"],
        "width": spec["width"],
    }


def loss_config():
    return {
        "module": "network.loss.AlphaLoss",
        "loss_fn": "network.loss.smape",
        "alpha_loss_fn": "network.loss.mse",
    }


def renderer_config(spec=SPEC):
    return {
        "module": "network.renderer.Renderer",
        "n_samples": spec["n_samples"],
        "perturb": True,
        "render_chunk": 32768,
        "net_chunk": 65536,
    }


def full_config(target_path, spec=SPEC, n_iters=None):
    """The reference-schema training config (mirrors config_carpet_train.py)."""
    return {
        "module": "network.train.Train",
        "target_path": target_path,
        "override": True,
        "seed": spec["seed"],
        "train_dataset_config": train_dataset_config(spec),
        "val_dataset_config": test_dataset_config(),
        "model_config": model_config(spec),
        "loss_config": loss_config(),
        "n_iters": n_iters if n_iters is not None else spec["n_iters"],
        "lrate": spec["lrate"],
        "lrate_decay": spec["lrate_decay"],
        "renderer_config": renderer_config(spec),
        "logger_config": {
            "module": "network.logger.Logger",
            "i_img": 10**9,          # no mid-training validation renders
            "i_checkpoint": 500,
            "i_print": 25,
        },
    }


def psnr(a, b):
    import numpy as np

    mse = float(((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean())
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))
