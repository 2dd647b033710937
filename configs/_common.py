"""Builders shared by the shipped workload configs.

Each config module exports a `config` dict with the exact schema the
reference's configs use (SURVEY.md §2.3) — these helpers just keep the nine
files short.  All values mirror the upstream configs of the same name.
"""


def ff(n_freq_bands):
    return {"module": "network.model.FourierFeatures", "n_freq_bands": n_freq_bands}


def param_nerf(n_parameters, **extra):
    cfg = {
        "module": "network.model.ParamNerf",
        "pos_embedding": ff(10),
        "dir_embedding": ff(4),
        "param_embedding": ff(4),
        "n_parameters": n_parameters,
    }
    cfg.update(extra)
    return cfg


def aabb(b_0, b_1):
    return {"module": "network.proxy.AABB", "b_0": b_0, "b_1": b_1}


def constant_dist(constants):
    return {"module": "data.distribution.Constant", "constants": constants}


def train_dataset(tfr_path, proxy, n_samples=256, batchsize=4, shuffle_buffer_size=100):
    return {
        "module": "network.dataset.Dataset",
        "data_loader_config": {"module": "network.dataset.TFRecord", "tfr_path": tfr_path},
        "pixel_sampler_config": {
            "module": "network.pixel_sampler.Proxy",
            "n_samples": n_samples,
        },
        "ray_sampler_config": {"module": "network.ray_sampler.Proxy"},
        "proxy_config": proxy,
        "batchsize": batchsize,
        "shuffle_buffer_size": shuffle_buffer_size,
    }


def generated_dataset(loader, proxy):
    return {
        "module": "network.dataset.Dataset",
        "data_loader_config": loader,
        "pixel_sampler_config": {"module": "network.pixel_sampler.Full"},
        "ray_sampler_config": {"module": "network.ray_sampler.Proxy"},
        "proxy_config": proxy,
        "n_epochs": 1,
    }


def val_loader(param_constants, angle=0.63, **extra):
    cfg = {
        "module": "network.dataset.GenerateData",
        "angle": angle,
        "pose_dist_config": constant_dist([[0.47, -0.65, 0.6]]),
        "parameter_dist_config": constant_dist(param_constants),
    }
    cfg.update(extra)
    return cfg


def train_config(
    target_path,
    tfr_path,
    proxy_b0,
    proxy_b1,
    n_parameters,
    val_param_constants,
    renderer_extra=None,
    model_extra=None,
):
    proxy = aabb(proxy_b0, proxy_b1)
    renderer = {
        "module": "network.renderer.Renderer",
        "n_samples": 256,
        "perturb": True,
        "render_chunk": 32768,
        "net_chunk": 65536,
    }
    renderer.update(renderer_extra or {})
    return {
        "module": "network.train.Train",
        "target_path": target_path,
        "override": True,
        "seed": 0,
        "train_dataset_config": train_dataset(tfr_path, proxy),
        "val_dataset_config": generated_dataset(val_loader(val_param_constants), proxy),
        "model_config": param_nerf(n_parameters, **(model_extra or {})),
        "loss_config": {
            "module": "network.loss.AlphaLoss",
            "loss_fn": "network.loss.smape",
            "alpha_loss_fn": "network.loss.mse",
        },
        "n_iters": 500000,
        "lrate": 5e-4,
        "lrate_decay": 500,
        "renderer_config": renderer,
        "logger_config": {"module": "network.logger.Logger"},
    }


def render_config(
    target_path,
    loader,
    proxy_b0,
    proxy_b1,
    n_parameters,
    instancer,
    renderer_extra=None,
    model_extra=None,
):
    return {
        "module": "network.render.Render",
        "target_path": target_path,
        "override": True,
        "seed": 0,
        "test_dataset_config": generated_dataset(loader, aabb(proxy_b0, proxy_b1)),
        "model_config": param_nerf(n_parameters, **(model_extra or {})),
        "renderer_config": dict(
            {
                "module": "network.renderer.InstanceRenderer",
                "instancer_config": instancer,
            },
            **(renderer_extra or {}),
        ),
        "logger_config": {"module": "network.logger.Logger"},
    }
