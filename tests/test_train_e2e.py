import json
import os

import numpy as np

from nerftex_tpu.utils import util, rng
from nerftex_tpu.utils.util import EasyDict
from nerftex_tpu.tools.synth import make_synthetic_tfrecord


def _train_config(tfr_path, target_path, n_iters=25, **overrides):
    cfg = EasyDict(
        {
            "module": "network.train.Train",
            "target_path": str(target_path),
            "override": True,
            "seed": 0,
            "train_dataset_config": {
                "module": "network.dataset.Dataset",
                "data_loader_config": {
                    "module": "network.dataset.TFRecord",
                    "tfr_path": str(tfr_path),
                },
                "pixel_sampler_config": {
                    "module": "network.pixel_sampler.Proxy",
                    "n_samples": 32,
                    "downsample_factor": 2,
                },
                "ray_sampler_config": {"module": "network.ray_sampler.Proxy"},
                "proxy_config": {
                    "module": "network.proxy.AABB",
                    "b_0": [-1.5, -1.3, -0.2],
                    "b_1": [1.3, 1.3, 1.9],
                },
                "batchsize": 2,
                "shuffle_buffer_size": 8,
                "prefetch": 0,
            },
            "val_dataset_config": {
                "module": "network.dataset.Dataset",
                "data_loader_config": {
                    "module": "network.dataset.GenerateData",
                    "height": 8,
                    "width": 8,
                    "angle": 0.63,
                    "radius": 5.0,
                    "pose_dist_config": {
                        "module": "data.distribution.Constant",
                        "constants": [[0.47, -0.65, 0.6]],
                    },
                    "parameter_dist_config": {
                        "module": "data.distribution.Constant",
                        "constants": [[0.5, 1, 1, 0.1, 0, -0.707, 0.707]],
                    },
                },
                "pixel_sampler_config": {"module": "network.pixel_sampler.Full"},
                "ray_sampler_config": {"module": "network.ray_sampler.Proxy"},
                "proxy_config": {
                    "module": "network.proxy.AABB",
                    "b_0": [-1.5, -1.3, -0.2],
                    "b_1": [1.3, 1.3, 1.9],
                },
                "n_epochs": 1,
                "prefetch": 0,
            },
            "model_config": {
                "module": "network.model.ParamNerf",
                "pos_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 6},
                "dir_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 2},
                "param_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 2},
                "n_parameters": [1, 6],
                "depth": 3,
                "width": 64,
                "skips": [1],
            },
            "loss_config": {
                "module": "network.loss.AlphaLoss",
                "loss_fn": "network.loss.smape",
                "alpha_loss_fn": "network.loss.mse",
            },
            "n_iters": n_iters,
            "lrate": 5e-3,
            "lrate_decay": 500,
            "renderer_config": {
                "module": "network.renderer.Renderer",
                "n_samples": 32,
                "perturb": True,
            },
            "logger_config": {
                "module": "network.logger.Logger",
                "i_summary": 1,
                "i_print": 10,
                "i_img": 20,
                "i_checkpoint": 10,
            },
        }
    )
    cfg.update(overrides)
    return cfg


def test_training_end_to_end(tmp_path):
    os.environ["NERFTEX_NO_TENSORBOARD"] = "1"
    rng.set_seed(0)
    tfr_path = tmp_path / "train.tfr"
    make_synthetic_tfrecord(str(tfr_path), n_images=8, size=16)

    target = tmp_path / "logs"
    cfg = _train_config(tfr_path, target, n_iters=25)
    models = util.instantiate(cfg)

    # Loss must trend down on the analytic dataset.
    scalars = [
        json.loads(line)
        for line in open(target / "scalars.jsonl")
    ]
    losses = [s["Loss"] for s in scalars]
    assert len(losses) == 25
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9, losses

    # Checkpoints saved with retention.
    ckpts = os.listdir(target / "checkpoints")
    assert any("ckpt-20" in c for c in ckpts)

    # Validation render written at step 20.
    val_dir = target / "media/validation" / "20"
    assert val_dir.exists() and len(list(val_dir.iterdir())) == 1

    # Model params finite after training.
    import jax

    for leaf in jax.tree.leaves(models["model"].params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_training_resume(tmp_path):
    os.environ["NERFTEX_NO_TENSORBOARD"] = "1"
    rng.set_seed(0)
    tfr_path = tmp_path / "train.tfr"
    make_synthetic_tfrecord(str(tfr_path), n_images=4, size=16)

    target = tmp_path / "logs"
    util.instantiate(_train_config(tfr_path, target, n_iters=10))

    # Second invocation restores step 10 and runs only 5 more.
    import nerftex_tpu.models.mlp as mlp_mod

    rng.set_seed(0)
    mlp_mod._INIT_COUNTER[0] = 0
    util.instantiate(_train_config(tfr_path, target, n_iters=15))

    scalars = [json.loads(line) for line in open(target / "scalars.jsonl")]
    steps = [s["step"] for s in scalars]
    assert steps == list(range(1, 11)) + list(range(11, 16))


def test_render_driver_writes_test_images(tmp_path):
    """network.render.Render with a plain Renderer (no instancer yet):
    restores a checkpoint and renders the test dataset immediately."""
    os.environ["NERFTEX_NO_TENSORBOARD"] = "1"
    rng.set_seed(0)
    tfr_path = tmp_path / "train.tfr"
    make_synthetic_tfrecord(str(tfr_path), n_images=4, size=16)
    target = tmp_path / "logs"
    cfg = _train_config(tfr_path, target, n_iters=5)
    util.instantiate(cfg)

    render_cfg = EasyDict(
        {
            "module": "network.render.Render",
            "target_path": str(target),
            "override": True,
            "test_dataset_config": cfg["val_dataset_config"],
            "model_config": cfg["model_config"],
            "renderer_config": {
                "module": "network.renderer.Renderer",
                "n_samples": 32,
                "perturb": False,
            },
            "logger_config": {"module": "network.logger.Logger"},
        }
    )
    import nerftex_tpu.models.mlp as mlp_mod

    rng.set_seed(0)
    mlp_mod._INIT_COUNTER[0] = 0
    util.instantiate(render_cfg)

    test_dir = target / "media/test"
    imgs = list(test_dir.iterdir())
    assert len(imgs) == 1
    from nerftex_tpu.utils.image import read_image

    img = read_image(str(imgs[0]))
    assert img.shape == (8, 8, 4)


def test_render_with_source_path(tmp_path):
    """Render restores a checkpoint from a different source_path
    (render.py:11, logger.py:15)."""
    os.environ["NERFTEX_NO_TENSORBOARD"] = "1"
    rng.set_seed(0)
    tfr_path = tmp_path / "train.tfr"
    make_synthetic_tfrecord(str(tfr_path), n_images=4, size=16)
    train_target = tmp_path / "trained"
    cfg = _train_config(tfr_path, train_target, n_iters=5)
    util.instantiate(cfg)

    import nerftex_tpu.models.mlp as mlp_mod

    rng.set_seed(0)
    mlp_mod._INIT_COUNTER[0] = 0
    render_target = tmp_path / "rendered"
    util.instantiate(
        EasyDict(
            {
                "module": "network.render.Render",
                "target_path": str(render_target),
                "source_path": str(train_target),
                "override": True,
                "test_dataset_config": cfg["val_dataset_config"],
                "model_config": cfg["model_config"],
                "renderer_config": {
                    "module": "network.renderer.Renderer",
                    "n_samples": 16,
                    "perturb": False,
                },
                "logger_config": {"module": "network.logger.Logger"},
            }
        )
    )
    assert (render_target / "media/test/0.png").exists()
