"""Coverage for less-traveled paths: CoarseFine+importance training, EXR
records, checkpoint retention, logger downsampling, MipRenderer training."""

import json
import os

import numpy as np

from nerftex_tpu.utils import util, rng
from nerftex_tpu.utils.util import EasyDict
from nerftex_tpu.data import tfrecord as tfr
from nerftex_tpu.tools.synth import make_synthetic_tfrecord


def test_coarse_fine_importance_training(tmp_path):
    """CoarseFine model + n_importance>0: both models train, loss drops."""
    os.environ["NERFTEX_NO_TENSORBOARD"] = "1"
    rng.set_seed(0)
    import nerftex_tpu.models.mlp as mlp_mod

    mlp_mod._INIT_COUNTER[0] = 0
    tfr_path = str(tmp_path / "t.tfr")
    make_synthetic_tfrecord(tfr_path, n_images=6, size=16)

    cfg = EasyDict(
        {
            "module": "network.train.Train",
            "target_path": str(tmp_path / "logs"),
            "override": True,
            "seed": 0,
            "train_dataset_config": {
                "module": "network.dataset.Dataset",
                "data_loader_config": {"module": "network.dataset.TFRecord", "tfr_path": tfr_path},
                "pixel_sampler_config": {"module": "network.pixel_sampler.Independent", "n_samples": 24},
                "ray_sampler_config": {"module": "network.ray_sampler.Proxy"},
                "proxy_config": {"module": "network.proxy.AABB", "b_0": [-1.5, -1.3, -0.2], "b_1": [1.3, 1.3, 1.9]},
                "batchsize": 2,
                "prefetch": 0,
            },
            "val_dataset_config": None,
            "model_config": {
                "module": "network.model.CoarseFine",
                "model_config": {
                    "module": "network.model.ParamNerf",
                    "pos_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 4},
                    "dir_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 2},
                    "param_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 2},
                    "depth": 2,
                    "width": 32,
                    "skips": [1],
                },
            },
            "loss_config": {
                "module": "network.loss.AlphaLoss",
                "loss_fn": "network.loss.smape",
                "alpha_loss_fn": "network.loss.mse",
            },
            "n_iters": 12,
            "lrate": 5e-3,
            "lrate_decay": 500,
            "renderer_config": {
                "module": "network.renderer.Renderer",
                "n_samples": 16,
                "n_importance": 8,
                "perturb": True,
            },
            "logger_config": {"module": "network.logger.Logger", "i_summary": 1, "i_print": 100,
                               "i_img": 1000, "i_checkpoint": 1000},
        }
    )
    models = util.instantiate(cfg)
    assert set(models) == {"model", "model_fine"}
    scalars = [json.loads(l) for l in open(tmp_path / "logs/scalars.jsonl")]
    losses = [s["Loss"] for s in scalars]
    assert len(losses) == 12
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_exr_style_tfrecord_roundtrip(tmp_path):
    """read_exr path: image stored as a serialized float32 [H,W,4] tensor."""
    rs = np.random.RandomState(0)
    size = 8
    payloads = []
    from nerftex_tpu.data.dataset import look_at_np

    for _ in range(2):
        img = rs.rand(size, size, 4).astype(np.float32) * 2.0  # HDR range
        pose = look_at_np(np.array([0.4, -0.6, 0.7]) * 5.0)
        payloads.append(
            tfr.build_example(
                {
                    "image": tfr.serialize_tensor(img),
                    "pose": tfr.serialize_tensor(pose.astype(np.float32)),
                    "angle": 0.63,
                    "parameters": tfr.serialize_tensor(rs.rand(3).astype(np.float32)),
                }
            )
        )
    path = str(tmp_path / "exr.tfr")
    tfr.write_records(path, payloads)

    dataset = util.instantiate(
        EasyDict(
            {
                "module": "network.dataset.Dataset",
                "data_loader_config": {
                    "module": "network.dataset.TFRecord",
                    "tfr_path": path,
                    "read_exr": True,
                    "composite_bkgd": True,  # must be forced off for exr
                },
                "pixel_sampler_config": {"module": "network.pixel_sampler.Independent", "n_samples": 4},
                "ray_sampler_config": {"module": "network.ray_sampler.Frustum", "near": 2.0, "far": 8.0},
                "n_epochs": 1,
                "prefetch": 0,
            }
        )
    )
    assert dataset.composite_bkgd is False  # dataset.py:126-127 parity
    batch = next(iter(dataset))
    assert batch["color"].max() > 1.0  # HDR values survive (no png clamp)


def test_checkpoint_retention(tmp_path):
    from nerftex_tpu.render.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=3, keep_every_n_hours=9999)
    for step in range(1, 8):
        mgr.save({"v": np.full(3, step)}, step)
    kept = mgr.checkpoints()
    assert len(kept) <= 4  # 3 recent + the preserved first
    assert 7 in kept
    restored = mgr.restore_latest()
    np.testing.assert_array_equal(restored["v"], [7, 7, 7])


def test_checkpoint_hourly_preservation_is_permanent(tmp_path, monkeypatch):
    """keep_every_n_hours preserves a checkpoint PERMANENTLY (reference
    tf.train.CheckpointManager semantics) — later sweeps must not delete it.
    Round-3 regression: the old sweep only skipped one deletion round."""
    import nerftex_tpu.render.checkpoint as ck

    clock = [1000.0]
    monkeypatch.setattr(ck.time, "time", lambda: clock[0])

    mgr = ck.CheckpointManager(str(tmp_path / "ck"), max_to_keep=2, keep_every_n_hours=1)
    # One save every 20 minutes for 4 hours of fake time.
    for i, step in enumerate(range(1, 13)):
        clock[0] = 1000.0 + i * 1200.0
        mgr.save({"v": np.full(2, step)}, step)

    kept = sorted(mgr.checkpoints())
    # Newest two always kept.
    assert kept[-2:] == [11, 12]
    # Hourly preserved checkpoints survive every later sweep: with the clock
    # starting at step 1's save, the first eviction candidate >= 1h later is
    # preserved, then again each following hour (steps 20min apart -> every
    # 4th candidate less clock skew).
    preserved = kept[:-2]
    assert len(preserved) >= 3, f"expected >=3 hourly-preserved, got {kept}"
    times = [1000.0 + (s - 1) * 1200.0 for s in preserved]
    assert all(b - a >= 3600.0 for a, b in zip(times, times[1:])), kept
    # And they are real, restorable files.
    assert all(
        os.path.exists(os.path.join(str(tmp_path / "ck"), f"ckpt-{s}.pkl")) for s in kept
    )


def test_logger_downsampling_factor(tmp_path):
    """downsampling_factor filters + shrinks the rendered validation image
    (logger.py:129-130)."""
    os.environ["NERFTEX_NO_TENSORBOARD"] = "1"
    import jax
    import jax.numpy as jnp

    from nerftex_tpu.render.logger import Logger
    from nerftex_tpu.models.mlp import Model
    from nerftex_tpu.render.renderer import Renderer

    def apply(params, pos, dirs, prms):
        n = pos.shape[0]
        return jnp.zeros((n, 3)) + 0.0 * params["w"].sum(), jnp.full((n, 1), 5.0)

    model = Model("model", {"w": jnp.zeros(1)}, apply)
    renderer = Renderer(model=model, n_samples=8, perturb=False)

    dataset = util.instantiate(
        EasyDict(
            {
                "module": "network.dataset.Dataset",
                "data_loader_config": {
                    "module": "network.dataset.GenerateData",
                    "height": 16,
                    "width": 16,
                    "angle": 0.63,
                    "radius": 5.0,
                    "pose_dist_config": {"module": "data.distribution.Constant", "constants": [[0.47, -0.65, 0.6]]},
                    "parameter_dist_config": {"module": "data.distribution.Constant", "constants": [[0.0]]},
                },
                "pixel_sampler_config": {"module": "network.pixel_sampler.Full"},
                "ray_sampler_config": {"module": "network.ray_sampler.Frustum", "near": 3.0, "far": 7.0},
                "n_epochs": 1,
                "prefetch": 0,
            }
        )
    )

    logger = Logger(
        target_path=str(tmp_path / "out"),
        checkpoint_variables={"model": model},
        dataset=dataset,
        is_training=False,
        renderer=renderer,
        downsampling_factor=2,
    )
    from nerftex_tpu.utils.image import read_image

    img = read_image(str(tmp_path / "out/media/test/0.png"))
    assert img.shape == (8, 8, 4)  # 16/2


def test_mip_renderer_training_path(tmp_path):
    """MipRenderer trains with blur-prefiltered parameters (grass_filtered
    style: blur at index 0, IPE positions)."""
    rng.set_seed(0)
    import jax
    import jax.numpy as jnp
    import nerftex_tpu.models.mlp as mlp_mod

    mlp_mod._INIT_COUNTER[0] = 0
    models = util.instantiate(
        EasyDict(
            {
                "module": "network.model.ParamNerf",
                "pos_embedding": {"module": "network.model.IntegratedPositionalEncoding", "n_freq_bands": 6},
                "dir_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 2},
                "param_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 2},
                "n_parameters": [1, 3],
                "n_pos": 6,
                "depth": 2,
                "width": 32,
                "skips": [1],
            }
        )
    )
    from nerftex_tpu.render.renderer import MipRenderer
    from nerftex_tpu.render.loss import AlphaLoss
    from nerftex_tpu.render.train import make_optimizer, make_train_step

    renderer = MipRenderer(model=models["model"], n_samples=16, perturb=True, blur_idx=0)
    loss_fn = AlphaLoss(loss_fn="network.loss.smape", alpha_loss_fn="network.loss.mse")
    optimizer = make_optimizer(5e-3, 500)
    step = make_train_step(renderer, loss_fn, optimizer, False, [1, 1, 1.0], donate=False)

    rs = np.random.RandomState(0)
    batch = {
        "rays_o": jnp.asarray((rs.randn(2, 16, 3) * 0.05 + [0, 0, 4]).astype(np.float32)),
        "rays_d": jnp.asarray(np.tile([0, 0, -1.0], (2, 16, 1)).astype(np.float32)),
        "t": jnp.asarray(np.tile([2.0, 5.0], (2, 16, 1)).astype(np.float32)),
        # [blur, geo, app x3]
        "parameters": jnp.asarray(rs.rand(2, 5).astype(np.float32)),
        "cone_scale": jnp.full((2, 16, 1), 0.01, jnp.float32),
        "color": jnp.asarray(rs.rand(2, 16, 3).astype(np.float32)),
        "alpha": jnp.asarray((rs.rand(2, 16) > 0.4).astype(np.float32)),
    }
    params = renderer.current_params()
    opt_state = optimizer.init(params)
    losses = []
    for i in range(8):
        params, opt_state, loss = step(params, opt_state, batch, jax.random.key(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_checkpoint_multihost_single_writer(tmp_path, monkeypatch):
    """Multi-host discipline (PARITY.md): only process 0 writes checkpoints;
    other processes return the would-be path without touching disk, and
    restore_latest still works everywhere."""
    import jax
    from nerftex_tpu.render.checkpoint import CheckpointManager

    state = {"w": np.arange(4.0, dtype=np.float32)}

    # Non-zero process: no file may appear.
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    path = mgr.save(state, step=10)
    assert not os.path.exists(path)
    assert mgr.latest_checkpoint is None
    assert mgr.restore_latest() is None

    # Process 0: exactly one writer produces the file; everyone can restore.
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    path = mgr.save(state, step=10)
    assert os.path.exists(path)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    restored = mgr.restore_latest()
    np.testing.assert_array_equal(restored["w"], state["w"])
    assert len(mgr.checkpoints()) == 1


def test_mip_training_finite_with_miss_rays():
    """Proxy-missing rays (t = inf) must not poison the MipRenderer loss or
    gradients: their zeroed t made the conical-frustum moments 0/0
    (cone_segment_gaussians), and NaN * mask stays NaN through the backward.
    Regression for the grass_mip demo divergence (step-14 NaN)."""
    rng.set_seed(0)
    import jax
    import jax.numpy as jnp
    import optax
    import nerftex_tpu.models.mlp as mlp_mod

    mlp_mod._INIT_COUNTER[0] = 0
    models = util.instantiate(
        EasyDict(
            {
                "module": "network.model.ParamNerf",
                "pos_embedding": {"module": "network.model.IntegratedPositionalEncoding", "n_freq_bands": 4},
                "dir_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 2},
                "param_embedding": {"module": "network.model.FourierFeatures", "n_freq_bands": 2},
                "n_parameters": [1, 3],
                "n_pos": 6,
                "depth": 2,
                "width": 32,
                "skips": [1],
            }
        )
    )
    from nerftex_tpu.render.renderer import MipRenderer
    from nerftex_tpu.render.loss import AlphaLoss

    renderer = MipRenderer(model=models["model"], n_samples=8, perturb=True, blur_idx=0)
    loss_fn = AlphaLoss(loss_fn="network.loss.smape", alpha_loss_fn="network.loss.mse")

    rs = np.random.RandomState(0)
    t = np.tile([2.0, 5.0], (2, 8, 1)).astype(np.float32)
    t[0, :3] = np.inf  # proxy-missing rays
    batch = {
        "rays_o": jnp.asarray((rs.randn(2, 8, 3) * 0.05 + [0, 0, 4]).astype(np.float32)),
        "rays_d": jnp.asarray(np.tile([0, 0, -1.0], (2, 8, 1)).astype(np.float32)),
        "t": jnp.asarray(t),
        "parameters": jnp.asarray(rs.rand(2, 5).astype(np.float32)),
        "cone_scale": jnp.full((2, 8, 1), 0.01, jnp.float32),
        "color": jnp.asarray(rs.rand(2, 8, 3).astype(np.float32)),
        "alpha": jnp.asarray((rs.rand(2, 8) > 0.4).astype(np.float32)),
    }

    def loss_of(p):
        pred = renderer.apply(p, batch, jax.random.key(3), training=True)
        return loss_fn(color_true=batch["color"], alpha_true=batch["alpha"], **pred)

    params = {"model": models["model"].params}
    loss, grads = jax.value_and_grad(loss_of)(params)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(optax.global_norm(grads)))
