import json
import os

import numpy as np
import pytest

from nerftex_tpu.utils.util import EasyDict
from nerftex_tpu.utils import util, rng
from nerftex_tpu.tools.create_dataset import render_views
from nerftex_tpu.tools.nerf2tfr import convert
from nerftex_tpu.tools.blur import process as blur_process


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    """A tiny analytic swatch dataset in NeRF folder layout."""
    rng.set_seed(0)
    out = tmp_path_factory.mktemp("ds")
    config = EasyDict(
        {
            "seed": 0,
            "resolution": 16,
            "angle": 0.63,
            "subsets": [
                {
                    "name": "train",
                    "cam_radius": 5,
                    "pose_dist_config": {
                        "module": "data.distribution.Hemisphere",
                        "sampler_config": {"module": "data.sampler.Independent", "d": 2, "n": 4},
                    },
                    "parameter_dist_config": {
                        "module": "data.distribution.Concat",
                        "distribution_config_0": {
                            "module": "data.distribution.AABB",
                            "sampler_config": {"module": "data.sampler.Independent", "d": 4},
                        },
                        "distribution_config_1": {"module": "data.distribution.Sphere"},
                    },
                }
            ],
            "collections": [
                {
                    "name": "Carpet",
                    "hair_drivers": ["Length"],
                    "material_drivers": ["Saturation", "UndercoatValue"],
                    "light_drivers": ["Ambient", "LightDirection"],
                }
            ],
            "pose_file_save_interval": 2,
            "target_path": str(out / "carpet"),
        }
    )
    render_views(config, backend="analytic")
    return str(out / "carpet")


def test_create_dataset_layout(dataset_dir):
    assert os.path.isdir(os.path.join(dataset_dir, "train"))
    imgs = sorted(os.listdir(os.path.join(dataset_dir, "train")))
    assert len(imgs) == 4 and imgs[0].startswith("cam_")

    with open(os.path.join(dataset_dir, "transforms_train.json")) as f:
        transforms = json.load(f)
    assert len(transforms["frames"]) == 4
    frame = transforms["frames"][0]
    # Driver parameters in insertion order: Length, Saturation,
    # UndercoatValue, Ambient, LightX/Y/Z.
    keys = list(frame["driver_parameters"].keys())
    assert keys == ["Length", "Saturation", "UndercoatValue", "Ambient", "LightX", "LightY", "LightZ"]
    assert np.asarray(frame["transform_matrix"]).shape == (4, 4)


def test_create_dataset_resumable(dataset_dir, tmp_path):
    """Re-running with a larger sampler count appends, not restarts."""
    import shutil

    target = str(tmp_path / "resume")
    shutil.copytree(dataset_dir, target)
    config = EasyDict(json.load(open(os.path.join(dataset_dir, "config.json"))))
    config["target_path"] = target
    config["subsets"][0]["pose_dist_config"]["sampler_config"]["n"] = 6
    config["subsets"][0]["parameter_dist_config"]["distribution_config_0"]["sampler_config"]["n"] = 6
    render_views(config, backend="analytic")

    with open(os.path.join(target, "transforms_train.json")) as f:
        transforms = json.load(f)
    assert len(transforms["frames"]) == 6  # 4 existing + 2 appended


def test_nerf2tfr_to_training_dataset(dataset_dir, tmp_path):
    out_tfr = str(tmp_path / "train.tfr")
    written = convert(dataset_dir, out_tfr, subset="train")
    assert written == [out_tfr]

    dataset = util.instantiate(
        EasyDict(
            {
                "module": "network.dataset.Dataset",
                "data_loader_config": {
                    "module": "network.dataset.TFRecord",
                    "tfr_path": out_tfr,
                },
                "pixel_sampler_config": {
                    "module": "network.pixel_sampler.Independent",
                    "n_samples": 8,
                },
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
    assert dataset.height == dataset.width == 16
    assert dataset.n_parameters == 7
    batch = next(iter(dataset))
    assert batch["color"].shape == (1, 8, 3)
    assert np.isfinite(batch["color"]).all()


def test_nerf2tfr_sharding(dataset_dir, tmp_path):
    out_tfr = str(tmp_path / "sharded.tfr")
    written = convert(dataset_dir, out_tfr, subset="train", imgs_per_shard=3)
    assert len(written) == 2  # 4 images in shards of 3
    from nerftex_tpu.data import tfrecord as tfr

    counts = [len(list(tfr.read_records(p))) for p in written]
    assert counts == [3, 1]


def test_blur_pipeline(dataset_dir, tmp_path):
    out = str(tmp_path / "blurred")
    blur_process(dataset_dir, out, subsets=("train",), max_sigma=2.0, p=3.0)

    with open(os.path.join(out, "transforms_train.json")) as f:
        transforms = json.load(f)
    frame = transforms["frames"][0]
    keys = list(frame["driver_parameters"].keys())
    assert keys[0] == "Blur"  # prepended -> blur_idx=0 in configs
    assert len(transforms["frames"]) == 4

    # Blurred images exist and stay in range.
    from nerftex_tpu.utils.image import read_image

    imgs = sorted(os.listdir(os.path.join(out, "train")))
    img = read_image(os.path.join(out, "train", imgs[0]))
    assert img.shape == (16, 16, 4)
    assert img.min() >= 0 and img.max() <= 1

    # dataset_size_increase replicates frames with fresh sigmas.
    out2 = str(tmp_path / "blurred2x")
    blur_process(dataset_dir, out2, subsets=("train",), max_sigma=1.0, dataset_size_increase=2)
    with open(os.path.join(out2, "transforms_train.json")) as f:
        t2 = json.load(f)
    assert len(t2["frames"]) == 8
    sigmas = [f["driver_parameters"]["Blur"] for f in t2["frames"]]
    assert len(set(np.round(sigmas, 6))) > 1


def test_prefiltered_chain_end_to_end(tmp_path):
    """The grass_filtered recipe end to end: create_dataset (Length + light
    drivers only) -> blur (Blur prepended) -> nerf2tfr -> TFRecord loader.
    The loaded parameter vector must be [Blur, Length, LightXYZ] = 5 wide
    (n_parameters=[2,3] in the shipped configs) with Blur matching the sigma
    recorded in the transforms json, frame for frame."""
    rng.set_seed(0)
    src = str(tmp_path / "src")
    config = EasyDict(
        {
            "seed": 3,
            "resolution": 16,
            "subsets": [
                {
                    "name": "train",
                    "cam_radius": 5,
                    "pose_dist_config": {
                        "module": "data.distribution.Hemisphere",
                        "sampler_config": {"module": "data.sampler.Independent", "d": 2, "n": 3},
                    },
                    "parameter_dist_config": {
                        "module": "data.distribution.Concat",
                        "distribution_config_0": {
                            "module": "data.distribution.AABB",
                            "sampler_config": {"module": "data.sampler.Independent", "d": 1},
                        },
                        "distribution_config_1": {"module": "data.distribution.Sphere"},
                    },
                }
            ],
            "collections": [
                {
                    "name": "Grass",
                    "hair_drivers": ["Length"],
                    "material_drivers": [],
                    "light_drivers": ["LightDirection"],
                }
            ],
            "target_path": src,
        }
    )
    render_views(config, backend="analytic")

    blurred = str(tmp_path / "blurred")
    blur_process(src, blurred, subsets=("train",), max_sigma=4.0)
    out_tfr = str(tmp_path / "filtered.tfr")
    convert(blurred, out_tfr, subset="train")

    dataset = util.instantiate(
        EasyDict(
            {
                "module": "network.dataset.Dataset",
                "data_loader_config": {
                    "module": "network.dataset.TFRecord",
                    "tfr_path": out_tfr,
                },
                "pixel_sampler_config": {
                    "module": "network.pixel_sampler.Independent",
                    "n_samples": 4,
                },
                "ray_sampler_config": {"module": "network.ray_sampler.Proxy"},
                "proxy_config": {
                    "module": "network.proxy.AABB",
                    "b_0": [-1.5, -1.3, -0.2],
                    "b_1": [1.3, 1.3, 1.9],
                },
                "n_epochs": 1,
                "prefetch": 0,
                "shuffle_buffer_size": 0,
            }
        )
    )
    assert dataset.n_parameters == 5  # [Blur, Length, LightXYZ]

    with open(os.path.join(blurred, "transforms_train.json")) as f:
        sigmas = [fr["driver_parameters"]["Blur"] for fr in json.load(f)["frames"]]
    got = [float(np.asarray(b["parameters"])[0, 0]) for b in dataset]
    assert len(got) == 3
    np.testing.assert_allclose(sorted(got), sorted(sigmas), rtol=1e-6)


def test_synth_jax_backend_matches_numpy():
    """The device (jax) swatch renderer agrees with the host integrator to
    u8 quantization noise (<= 2 levels; float order-of-ops differs)."""
    import jax

    from nerftex_tpu.tools.synth import render_swatch, make_swatch_renderer_jax
    from nerftex_tpu.data.dataset import look_at_np

    b0 = np.float32([-1.5, -1.3, -0.2])
    b1 = np.float32([1.3, 1.3, 1.9])
    pose = look_at_np(np.array([2.0, -2.5, 2.2], np.float32)).astype(np.float32)
    params = np.float32([0.7, 0.3, 0.8, 0.2, 0.1, -0.2, -0.9])

    ref = render_swatch(pose, params, 1, 48, 0.63, b0, b1)
    ref_u8 = np.clip(ref * 255 + 0.5, 0, 255).astype(np.int32)
    out = np.asarray(make_swatch_renderer_jax(48, 0.63, b0, b1, 1)(pose, params)).astype(np.int32)
    d = np.abs(out - ref_u8)
    assert d.max() <= 2, f"jax synth backend diverges: max {d.max()} u8 levels"
    assert (d > 0).mean() < 0.2, "jax synth backend differs on too many pixels"
