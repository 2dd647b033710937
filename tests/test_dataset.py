import numpy as np

from nerftex_tpu.utils.util import EasyDict
from nerftex_tpu.utils import rng
from nerftex_tpu.utils.image import encode_png
from nerftex_tpu.data import tfrecord as tfr
from nerftex_tpu.data.dataset import Dataset, look_at_np
from nerftex_tpu.data.pixel_sampler import Full, Independent, Proxy as ProxyPixels
from nerftex_tpu.data.ray_sampler import Frustum, rays_from_camera_np
from nerftex_tpu.ops.proxy import AABB


def _write_synthetic_tfr(path, n_images=3, size=16, angle=0.63, n_params=7, seed=0):
    """A tiny dataset in the reference's TFRecord schema."""
    rs = np.random.RandomState(seed)
    payloads = []
    for i in range(n_images):
        rgba = rs.rand(size, size, 4).astype(np.float32)
        pose = look_at_np(np.array([0.4, -0.6, 0.7]) * 5.0)
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


def test_tfrecord_dataset_end_to_end(tmp_path):
    rng.set_seed(0)
    path = tmp_path / "train.tfr"
    _write_synthetic_tfr(path, n_images=3, size=16)

    config = EasyDict(
        {
            "module": "network.dataset.Dataset",
            "data_loader_config": {
                "module": "network.dataset.TFRecord",
                "tfr_path": str(path),
            },
            "pixel_sampler_config": {
                "module": "network.pixel_sampler.Proxy",
                "n_samples": 8,
                "downsample_factor": 2,
            },
            "ray_sampler_config": {"module": "network.ray_sampler.Proxy"},
            "proxy_config": {
                "module": "network.proxy.AABB",
                "b_0": [-1.5, -1.3, -0.2],
                "b_1": [1.3, 1.3, 1.9],
            },
            "batchsize": 2,
            "shuffle_buffer_size": 3,
            "prefetch": 0,
        }
    )
    from nerftex_tpu.utils import util

    dataset = util.instantiate(config)
    assert dataset.height == dataset.width == 16
    assert dataset.n_parameters == 7
    assert dataset.n_samples == 8

    batch = next(iter(dataset.take(1)))
    assert batch["rays_o"].shape == (2, 8, 3)
    assert batch["rays_d"].shape == (2, 8, 3)
    assert batch["t"].shape == (2, 8, 2)
    assert batch["cone_scale"].shape == (2, 8, 1)
    assert batch["color"].shape == (2, 8, 3)
    assert batch["alpha"].shape == (2, 8)
    assert batch["parameters"].shape == (2, 7)
    # Proxy pixel sampler only returns rays that hit the proxy.
    assert np.isfinite(batch["t"]).all()
    # Directions normalized by the Proxy ray sampler.
    np.testing.assert_allclose(np.linalg.norm(batch["rays_d"], axis=-1), 1.0, atol=1e-5)
    # Premultiplied color <= alpha-scaled bound.
    assert batch["color"].max() <= 1.0 + 1e-6


def test_dataset_epoch_cardinality(tmp_path):
    path = tmp_path / "t.tfr"
    _write_synthetic_tfr(path, n_images=5, size=8)
    from nerftex_tpu.utils import util

    dataset = util.instantiate(
        EasyDict(
            {
                "module": "network.dataset.Dataset",
                "data_loader_config": {
                    "module": "network.dataset.TFRecord",
                    "tfr_path": str(path),
                },
                "pixel_sampler_config": {
                    "module": "network.pixel_sampler.Independent",
                    "n_samples": 4,
                },
                "ray_sampler_config": {
                    "module": "network.ray_sampler.Frustum",
                    "near": 2.0,
                    "far": 6.0,
                },
                "n_epochs": 2,
                "batchsize": 2,
                "prefetch": 0,
            }
        )
    )
    batches = list(dataset)
    assert dataset.cardinality() == 5  # ceil(5*2/2)
    assert len(batches) == 5
    t = batches[0]["t"]
    np.testing.assert_allclose(t[..., 0], 2.0)
    np.testing.assert_allclose(t[..., 1], 6.0)


def test_generate_data_full_sampler():
    from nerftex_tpu.utils import util

    dataset = util.instantiate(
        EasyDict(
            {
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
                        "constants": [[0, 1, 1, 0.1, 0, -0.707, 0.707]],
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
            }
        )
    )
    assert dataset.n_samples == 64  # 8x8 Full sampler
    batches = list(dataset)
    assert len(batches) == 1
    assert batches[0]["rays_o"].shape == (1, 64, 3)
    assert "color" not in batches[0]
    np.testing.assert_allclose(
        batches[0]["parameters"][0], [0, 1, 1, 0.1, 0, -0.707, 0.707], atol=1e-6
    )


def test_generate_data_generator_source():
    from nerftex_tpu.utils import util

    source, h, w, focal, *_ = util.instantiate(
        EasyDict(
            {
                "module": "network.dataset.GenerateData",
                "dataset_size": 300,
                "pose_dist_config": {"module": "data.distribution.Hemisphere"},
                "parameter_dist_config": {
                    "module": "data.distribution.Constant",
                    "constants": [[1.0]],
                },
            }
        )
    )
    assert len(source) == 300
    r0 = source[0]
    r5 = source[5]
    assert r0["pose"].shape == (4, 4)
    assert r5["parameters"].tolist() == [1.0]


def test_proxy_pixel_sampler_only_returns_hits():
    proxy = AABB([-1, -1, -1], [1, 1, 1])
    h = w = 32
    focal = w / np.tan(0.63 / 2) / 2
    c2w = look_at_np(np.array([0.4, -0.6, 0.7]) * 5.0)
    sampler = ProxyPixels(h, w, 16, proxy, focal, downsample_factor=4)
    loc = sampler(c2w=c2w)
    assert loc.shape == (16, 2)
    # All sampled pixels' rays must hit the proxy at full resolution
    # (downsample grid is an approximation — allow the known edge effect
    # by verifying against the downsampled grid itself).
    rays_o, rays_d, _ = rays_from_camera_np(loc.astype(np.float32), h, w, focal, c2w)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    t = proxy.intersect_np(rays_o, rays_d)
    assert np.isfinite(t[:, 0]).mean() > 0.8


def test_full_and_independent_samplers():
    full = Full(4, 6)
    loc = full()
    assert loc.shape == (24, 2)
    assert loc[:, 0].max() == 3 and loc[:, 1].max() == 5

    ind = Independent(10, 12, 100)
    loc = ind()
    assert loc.shape == (100, 2)
    assert loc[:, 0].max() < 10 and loc[:, 1].max() < 12
