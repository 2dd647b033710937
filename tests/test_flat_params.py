"""Flat-parameter-space training (render/train.apply_flat_param_space).

TPU perf knob (docs/PERF.md §1.4): each model's params become one flat f32
theta, turning per-leaf gradient accumulation and per-matrix Adam fusions
into single wide ops.  These tests pin (a) step-for-step equivalence with
the pytree layout, (b) checkpoint resume across a layout switch in both
directions (optimizer moments included), (c) the fused multi-step path.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from nerftex_tpu.utils import util, rng
from nerftex_tpu.utils.util import EasyDict
from nerftex_tpu.render.train import (
    apply_flat_param_space,
    make_optimizer,
    make_train_step,
)
from nerftex_tpu.render.renderer import Renderer
from nerftex_tpu.render.loss import AlphaLoss
import nerftex_tpu.models.mlp as mlp_mod


def _models(seed=0):
    rng.set_seed(seed)
    mlp_mod._INIT_COUNTER[0] = 0
    ff = lambda n: {"module": "network.model.FourierFeatures", "n_freq_bands": n}
    return util.instantiate(EasyDict({
        "module": "network.model.ParamNerf",
        "pos_embedding": ff(6), "dir_embedding": ff(2), "param_embedding": ff(2),
        "n_parameters": [1, 6], "depth": 3, "width": 64, "skips": [1],
    }))


def _batch(b=2, r=32, seed=0):
    rs = np.random.RandomState(seed)
    d = rs.normal(size=(b, r, 3)).astype(np.float32)
    d[..., 2] = -np.abs(d[..., 2]) - 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "rays_o": jnp.asarray(np.tile([0, 0, 3.0], (b, r, 1)).astype(np.float32)),
        "rays_d": jnp.asarray(d),
        "t": jnp.asarray(np.tile([1.0, 5.0], (b, r, 1)).astype(np.float32)),
        "cone_scale": jnp.full((b, r, 1), 1e-3, jnp.float32),
        "parameters": jnp.asarray(rs.uniform(0, 1, (b, 7)).astype(np.float32)),
        "color": jnp.asarray(rs.uniform(0, 1, (b, r, 3)).astype(np.float32)),
        "alpha": jnp.asarray(rs.uniform(0, 1, (b, r)).astype(np.float32)),
    }


def _run_steps(models, n=3, remat=False, net_chunk=1024):
    renderer = Renderer(
        n_samples=16, net_chunk=net_chunk, remat_net_chunks=remat, perturb=True,
        **models,
    )
    loss_fn = AlphaLoss(loss_fn="network.loss.smape", alpha_loss_fn="network.loss.mse")
    optimizer = make_optimizer(5e-3, 500)
    step = make_train_step(renderer, loss_fn, optimizer, False, [1, 1, 1.0],
                           donate=False)
    params = {name: m.params for name, m in models.items()}
    opt_state = optimizer.init(params)
    losses = []
    batch = _batch()
    for i in range(n):
        params, opt_state, loss = step(params, opt_state, batch, jax.random.key(i))
        losses.append(float(loss))
    return params, losses


def test_flat_step_matches_pytree_step():
    models_ref = _models()
    params_ref, losses_ref = _run_steps(models_ref, remat=False)

    models_flat = _models()
    unravels = apply_flat_param_space(models_flat)
    params_flat, losses_flat = _run_steps(models_flat, remat=False)

    np.testing.assert_allclose(losses_flat, losses_ref, rtol=1e-6)
    back = unravels["model"](params_flat["model"])
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(params_ref["model"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_flat_step_matches_pytree_step_remat_chunks():
    # The production operating point shape: chunked lax.map + jax.checkpoint.
    models_ref = _models()
    params_ref, losses_ref = _run_steps(models_ref, remat=True, net_chunk=256)

    models_flat = _models()
    unravels = apply_flat_param_space(models_flat)
    params_flat, losses_flat = _run_steps(models_flat, remat=True, net_chunk=256)

    np.testing.assert_allclose(losses_flat, losses_ref, rtol=1e-6)
    back = unravels["model"](params_flat["model"])
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(params_ref["model"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_save_encodings_remat_matches_full_remat():
    """remat_net_chunks="save_encodings" (jax.checkpoint with a
    save_only_these_names("encoding") policy over the checkpoint_name-tagged
    encoder outputs, models/mlp.py::_enc) changes only the backward's
    recompute schedule — losses and trained params must match full remat
    step for step (docs/PERF.md §1.5)."""
    models_ref = _models()
    params_ref, losses_ref = _run_steps(models_ref, remat=True, net_chunk=256)

    models_se = _models()
    params_se, losses_se = _run_steps(models_se, remat="save_encodings",
                                      net_chunk=256)

    np.testing.assert_allclose(losses_se, losses_ref, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(params_se), jax.tree.leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_apply_flat_param_space_idempotent():
    models = _models()
    u1 = apply_flat_param_space(models)
    theta = models["model"].params
    u2 = apply_flat_param_space(models)
    assert u1["model"] is u2["model"]
    assert models["model"].params is theta


def _tiny_train_cfg(tfr_path, target_path, n_iters, **overrides):
    cfg = EasyDict({
        "module": "network.train.Train",
        "target_path": str(target_path),
        "override": False,
        "seed": 0,
        "train_dataset_config": {
            "module": "network.dataset.Dataset",
            "data_loader_config": {
                "module": "network.dataset.TFRecord", "tfr_path": str(tfr_path),
            },
            "pixel_sampler_config": {
                "module": "network.pixel_sampler.Proxy",
                "n_samples": 16, "downsample_factor": 2,
            },
            "ray_sampler_config": {"module": "network.ray_sampler.Proxy"},
            "proxy_config": {
                "module": "network.proxy.AABB",
                "b_0": [-1.5, -1.3, -0.2], "b_1": [1.3, 1.3, 1.9],
            },
            "batchsize": 2, "shuffle_buffer_size": 4, "prefetch": 0,
        },
        "val_dataset_config": {
            "module": "network.dataset.Dataset",
            "data_loader_config": {
                "module": "network.dataset.GenerateData",
                "height": 8, "width": 8, "angle": 0.63, "radius": 5.0,
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
                "b_0": [-1.5, -1.3, -0.2], "b_1": [1.3, 1.3, 1.9],
            },
            "n_epochs": 1, "prefetch": 0,
        },
        "model_config": {
            "module": "network.model.ParamNerf",
            "pos_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 4},
            "dir_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 2},
            "param_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 2},
            "n_parameters": [1, 6], "depth": 2, "width": 32, "skips": [],
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
            "module": "network.renderer.Renderer", "n_samples": 8, "perturb": True,
        },
        "logger_config": {
            "module": "network.logger.Logger",
            "i_summary": 1, "i_print": 100, "i_img": 10**9, "i_checkpoint": 2,
        },
    })
    cfg.update(overrides)
    return cfg


def test_resume_switching_layouts_both_ways(tmp_path):
    """pytree ckpt -> flat resume, then flat ckpt -> pytree resume: params
    AND Adam moments must convert (train._align_opt_state_layout,
    logger._match_param_layout)."""
    from nerftex_tpu.tools.synth import make_synthetic_tfrecord

    os.environ["NERFTEX_NO_TENSORBOARD"] = "1"
    rng.set_seed(0)
    tfr = tmp_path / "train.tfr"
    make_synthetic_tfrecord(str(tfr), n_images=4, size=16)
    target = tmp_path / "logs"

    util.instantiate(_tiny_train_cfg(tfr, target, n_iters=2))
    models_a = util.instantiate(
        _tiny_train_cfg(tfr, target, n_iters=4, flat_params=True)
    )
    theta = models_a["model"].params
    assert theta.ndim == 1
    assert np.isfinite(np.asarray(theta)).all()

    models_b = util.instantiate(
        _tiny_train_cfg(tfr, target, n_iters=6, flat_params=False)
    )
    leaves = jax.tree.leaves(models_b["model"].params)
    assert len(leaves) > 1
    for leaf in leaves:
        assert np.isfinite(np.asarray(leaf)).all()


def test_net_chunk_unroll_matches_to_ulp():
    """net_chunk_unroll only unrolls the chunk scan (renderer.chunked_apply):
    the transpose's per-leaf gradient accumulates keep their sequential
    association, but XLA fuses the unrolled body differently (fma
    contraction — same family as the PARITY.md cross-graph notes), so
    trained params match the rolled scan to ~1 ulp, not bit-exactly.  The
    FIRST forward (before any update) is bit-identical (docs/PERF.md §1.6)."""
    models_ref = _models()
    params_ref, losses_ref = _run_steps(models_ref, remat="save_encodings",
                                        net_chunk=256)

    models_u = _models()

    def _run_unrolled(models, n=3):
        renderer = Renderer(
            n_samples=16, net_chunk=256, remat_net_chunks="save_encodings",
            perturb=True, net_chunk_unroll=4, **models,
        )
        loss_fn = AlphaLoss(loss_fn="network.loss.smape",
                            alpha_loss_fn="network.loss.mse")
        optimizer = make_optimizer(5e-3, 500)
        step = make_train_step(renderer, loss_fn, optimizer, False, [1, 1, 1.0],
                               donate=False)
        params = {name: m.params for name, m in models.items()}
        opt_state = optimizer.init(params)
        losses = []
        batch = _batch()
        for i in range(n):
            params, opt_state, loss = step(params, opt_state, batch,
                                           jax.random.key(i))
            losses.append(float(loss))
        return params, losses

    params_u, losses_u = _run_unrolled(models_u)
    # First step's loss is computed before any divergent update: bit-equal.
    assert losses_u[0] == losses_ref[0]
    np.testing.assert_allclose(losses_u, losses_ref, rtol=1e-5, atol=0)
    for a, b in zip(jax.tree.leaves(params_u), jax.tree.leaves(params_ref)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-5, atol=1e-6)
