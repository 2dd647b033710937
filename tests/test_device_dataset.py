"""Device-resident data pipeline (data/device_dataset.py): per-sample math
must match the host pipeline (dataset.py data_map) on identical pixels, and
the fused Train path must converge like the host path."""

import json
import os

import numpy as np
import pytest

from nerftex_tpu.utils import rng, util
from nerftex_tpu.utils.util import EasyDict
from nerftex_tpu.utils.image import encode_png
from nerftex_tpu.data import tfrecord as tfr
from nerftex_tpu.data.dataset import Dataset, ListSource, look_at_np
from nerftex_tpu.data.ray_sampler import rays_from_camera_np

B_0 = [-1.5, -1.3, -0.2]
B_1 = [1.3, 1.3, 1.9]


def _write_tfr(path, n_images=4, size=16, angle=0.63, n_params=7, seed=0):
    """Tiny reference-schema TFRecord with DISTINCT poses and parameters."""
    rs = np.random.RandomState(seed)
    payloads = []
    for _ in range(n_images):
        rgba = rs.rand(size, size, 4).astype(np.float32)
        direction = rs.randn(3)
        direction[2] = abs(direction[2]) + 0.3
        pose = look_at_np(direction / np.linalg.norm(direction) * 5.0)
        params = rs.rand(n_params).astype(np.float32)
        payloads.append(
            tfr.build_example(
                {
                    "image": encode_png(rgba),
                    "pose": tfr.serialize_tensor(pose.astype(np.float32)),
                    "angle": float(angle),
                    "parameters": tfr.serialize_tensor(params),
                }
            )
        )
    tfr.write_records(str(path), payloads)


def _dataset(tfr_path, device_resident=True, n_samples=64, batchsize=3):
    config = EasyDict(
        {
            "module": "network.dataset.Dataset",
            "data_loader_config": {
                "module": "network.dataset.TFRecord",
                "tfr_path": str(tfr_path),
            },
            "pixel_sampler_config": {
                "module": "network.pixel_sampler.Proxy",
                "n_samples": n_samples,
                "downsample_factor": 2,
            },
            "ray_sampler_config": {"module": "network.ray_sampler.Proxy"},
            "proxy_config": {"module": "network.proxy.AABB", "b_0": B_0, "b_1": B_1},
            "batchsize": batchsize,
            "shuffle_buffer_size": 4,
            "prefetch": 0,
            "device_resident": device_resident,
        }
    )
    return util.instantiate(config)


def test_device_sampler_matches_host_math(tmp_path):
    import jax

    rng.set_seed(0)
    path = tmp_path / "train.tfr"
    _write_tfr(path, n_images=4, size=16)
    dataset = _dataset(path)
    sampler = dataset.device_sampler
    assert sampler._store == "u8"

    from nerftex_tpu.data.pixel_sampler import Proxy as ProxyPixels
    from nerftex_tpu.ops.proxy import AABB

    proxy = AABB(B_0, B_1)
    host_px = ProxyPixels(
        height=16, width=16, n_samples=64, proxy=proxy,
        focal=dataset.focal, downsample_factor=2,
    )

    batch, aux = jax.jit(lambda k: sampler.sample(k, with_aux=True))(jax.random.key(7))
    batch = {k: np.asarray(v) for k, v in batch.items()}
    img_idx = np.asarray(aux["img_idx"])
    loc = np.asarray(aux["loc"])

    for b in range(3):
        record = dataset.source[int(img_idx[b])]
        # Parameters/pose rows come from the right image.
        np.testing.assert_array_equal(batch["parameters"][b], record["parameters"])

        # Every sampled pixel is in the host sampler's hit set for this pose.
        hit = {tuple(p) for p in host_px._hit_pixels(record["pose"])}
        for s in range(loc.shape[1]):
            assert tuple(loc[b, s]) in hit

        # Rays/t/cone match the host ray sampler on the same pixels.
        rays_o, rays_d, cone = rays_from_camera_np(
            loc[b], 16, 16, dataset.focal, record["pose"]
        )
        rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
        t = proxy.intersect_np(rays_o, rays_d)
        np.testing.assert_allclose(batch["rays_o"][b], rays_o, atol=1e-6)
        np.testing.assert_allclose(batch["rays_d"][b], rays_d, atol=1e-6)
        np.testing.assert_allclose(batch["t"][b], t, atol=1e-5)
        np.testing.assert_allclose(batch["cone_scale"][b], cone, atol=1e-7)

        # Colors replay the premultiplied u8 decode (XLA folds /255 into a
        # reciprocal multiply -> 1-ulp tolerance).
        i, j = loc[b, :, 0], loc[b, :, 1]
        np.testing.assert_allclose(batch["color"][b], record["image"][i, j], atol=4e-7)
        np.testing.assert_allclose(batch["alpha"][b], record["alpha"][i, j], atol=4e-7)


def test_device_sampler_covers_all_hit_pixels(tmp_path):
    """Uniform-over-cells x uniform-within-cell must reach every hit pixel."""
    import jax

    rng.set_seed(0)
    path = tmp_path / "one.tfr"
    _write_tfr(path, n_images=1, size=16)
    dataset = _dataset(path, n_samples=256, batchsize=1)
    sampler = dataset.device_sampler

    from nerftex_tpu.data.pixel_sampler import Proxy as ProxyPixels
    from nerftex_tpu.ops.proxy import AABB

    host_px = ProxyPixels(
        height=16, width=16, n_samples=256, proxy=AABB(B_0, B_1),
        focal=dataset.focal, downsample_factor=2,
    )
    hit = {tuple(p) for p in host_px._hit_pixels(dataset.source[0]["pose"])}

    seen = set()
    fn = jax.jit(lambda k: sampler.sample(k, with_aux=True))
    for trial in range(40):
        _, aux = fn(jax.random.key(trial))
        for p in np.asarray(aux["loc"]).reshape(-1, 2):
            seen.add(tuple(p))
    assert seen <= hit, "sampled a pixel outside the proxy hit mask"
    assert len(seen) == len(hit), f"coverage {len(seen)}/{len(hit)} after 10k draws"


def test_float_store_and_frustum_modes():
    """ListSource (float images) + Independent pixels + Frustum rays."""
    import jax

    from nerftex_tpu.data.device_dataset import DeviceResidentSampler
    from nerftex_tpu.data.pixel_sampler import Independent
    from nerftex_tpu.data.ray_sampler import Frustum

    rs = np.random.RandomState(3)
    records = [
        {
            "image": rs.rand(8, 8, 3).astype(np.float32),
            "alpha": rs.rand(8, 8).astype(np.float32),
            "pose": look_at_np(np.array([0.4, -0.6, 0.7]) * 5.0),
            "parameters": rs.rand(2).astype(np.float32),
        }
        for _ in range(3)
    ]
    sampler = DeviceResidentSampler(
        ListSource(records),
        Independent(height=8, width=8, n_samples=16),
        Frustum(height=8, width=8, focal=10.0, near=1.0, far=7.0),
        batchsize=2,
        height=8,
        width=8,
        focal=10.0,
        composite_bkgd=False,
        bkgd_color=[1, 1, 1.0],
    )
    assert sampler._store == "f32"
    batch, aux = jax.jit(lambda k: sampler.sample(k, with_aux=True))(jax.random.key(0))
    batch = {k: np.asarray(v) for k, v in batch.items()}
    loc = np.asarray(aux["loc"])
    img_idx = np.asarray(aux["img_idx"])
    assert batch["t"].shape == (2, 16, 2)
    np.testing.assert_allclose(batch["t"][..., 0], 1.0)
    np.testing.assert_allclose(batch["t"][..., 1], 7.0)
    for b in range(2):
        rec = records[int(img_idx[b])]
        i, j = loc[b, :, 0], loc[b, :, 1]
        np.testing.assert_array_equal(batch["color"][b], rec["image"][i, j])
        np.testing.assert_array_equal(batch["alpha"][b], rec["alpha"][i, j])


def test_device_resident_rejects_unsupported(tmp_path):
    path = tmp_path / "odd.tfr"
    _write_tfr(path, n_images=1, size=15)  # 15 % 2 != 0
    with pytest.raises(ValueError, match="divisible"):
        _dataset(path)


def test_fused_training_end_to_end(tmp_path):
    """Train with device_resident: loss trends down, resume continues."""
    from nerftex_tpu.tools.synth import make_synthetic_tfrecord
    from tests.test_train_e2e import _train_config

    os.environ["NERFTEX_NO_TENSORBOARD"] = "1"
    rng.set_seed(0)
    tfr_path = tmp_path / "train.tfr"
    make_synthetic_tfrecord(str(tfr_path), n_images=8, size=16)

    target = tmp_path / "logs"
    cfg = _train_config(tfr_path, target, n_iters=25)
    cfg["train_dataset_config"]["device_resident"] = True
    models = util.instantiate(cfg)

    scalars = [json.loads(line) for line in open(target / "scalars.jsonl")]
    losses = [s["Loss"] for s in scalars]
    assert len(losses) == 25
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9, losses

    import jax

    for leaf in jax.tree.leaves(models["model"].params):
        assert np.isfinite(np.asarray(leaf)).all()

    # Resume: restores step 25, runs 5 more on the fused path.
    import nerftex_tpu.models.mlp as mlp_mod

    rng.set_seed(0)
    mlp_mod._INIT_COUNTER[0] = 0
    cfg = _train_config(tfr_path, target, n_iters=30)
    cfg["train_dataset_config"]["device_resident"] = True
    util.instantiate(cfg)
    scalars = [json.loads(line) for line in open(target / "scalars.jsonl")]
    assert [s["step"] for s in scalars][-5:] == list(range(26, 31))


def test_steps_per_dispatch_matches_single_step(tmp_path):
    """K steps per device program must reproduce the K=1 run (keys are
    folded with absolute step indices inside the loop)."""
    from nerftex_tpu.tools.synth import make_synthetic_tfrecord
    from tests.test_train_e2e import _train_config

    os.environ["NERFTEX_NO_TENSORBOARD"] = "1"
    tfr_path = tmp_path / "train.tfr"
    rng.set_seed(0)
    make_synthetic_tfrecord(str(tfr_path), n_images=6, size=16)

    import jax
    import nerftex_tpu.models.mlp as mlp_mod

    results = {}
    for k in (1, 5):
        rng.set_seed(0)
        mlp_mod._INIT_COUNTER[0] = 0
        cfg = _train_config(tfr_path, tmp_path / f"logs_k{k}", n_iters=20)
        cfg["train_dataset_config"]["device_resident"] = True
        cfg["steps_per_dispatch"] = k
        cfg["logger_config"]["i_img"] = 10**9
        models = util.instantiate(cfg)
        results[k] = [np.asarray(l) for l in jax.tree.leaves(models["model"].params)]

    for a, b in zip(results[1], results[5]):
        np.testing.assert_allclose(a, b, atol=1e-5)

    # Scalars logged per step either way.
    s1 = [json.loads(l) for l in open(tmp_path / "logs_k1" / "scalars.jsonl")]
    s5 = [json.loads(l) for l in open(tmp_path / "logs_k5" / "scalars.jsonl")]
    assert [s["step"] for s in s1] == [s["step"] for s in s5]
    np.testing.assert_allclose(
        [s["Loss"] for s in s1], [s["Loss"] for s in s5], rtol=1e-4, atol=1e-6
    )
