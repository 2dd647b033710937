"""Vendored OpenEXR codec (utils/exr.py): round-trip + format checks.

Closes the reference's pyexr write path (network/logger.py:141-144) without
an .npy sidecar deviation.
"""

import struct

import numpy as np
import pytest

from nerftex_tpu.utils.exr import read_exr, write_exr


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_roundtrip_exact(tmp_path, channels):
    rs = np.random.RandomState(channels)
    img = rs.randn(7, 5, channels).astype(np.float32) * 10.0  # HDR range
    path = str(tmp_path / "t.exr")
    write_exr(path, img)
    back = read_exr(path)
    np.testing.assert_array_equal(back, img)


def test_roundtrip_2d(tmp_path):
    img = np.linspace(0, 4, 12, dtype=np.float32).reshape(3, 4)
    path = str(tmp_path / "y.exr")
    write_exr(path, img)
    np.testing.assert_array_equal(read_exr(path), img[..., None])


def test_header_is_standard_openexr(tmp_path):
    """Magic, version, and required attributes parse per the OpenEXR layout,
    with channels name-sorted (A,B,G,R) as the spec requires."""
    path = str(tmp_path / "h.exr")
    write_exr(path, np.zeros((2, 3, 4), np.float32))
    buf = open(path, "rb").read()
    magic, version = struct.unpack_from("<ii", buf, 0)
    assert magic == 20000630 and version == 2

    # Walk attributes; collect names and the chlist channel order.
    pos, names, ch_order = 8, [], []
    while buf[pos] != 0:
        end = buf.index(b"\0", pos)
        name = buf[pos:end].decode()
        names.append(name)
        pos = buf.index(b"\0", end + 1) + 1  # skip type
        (size,) = struct.unpack_from("<i", buf, pos)
        val = buf[pos + 4 : pos + 4 + size]
        pos += 4 + size
        if name == "channels":
            p = 0
            while val[p] != 0:
                e = val.index(b"\0", p)
                ch_order.append(val[p:e].decode())
                p = e + 1 + 16
    assert ch_order == ["A", "B", "G", "R"]
    for required in (
        "channels", "compression", "dataWindow", "displayWindow",
        "lineOrder", "pixelAspectRatio", "screenWindowCenter", "screenWindowWidth",
    ):
        assert required in names


def test_logger_writes_real_exr_validation_render(tmp_path):
    """Logger with write_exr=True produces a readable .exr (premultiplied,
    reference logger.py:139-144 keeps EXR premultiplied, PNG un-premultiplies)."""
    from nerftex_tpu.render.logger import Logger

    class TinyDataset:
        height, width = 4, 4
        composite_bkgd = False
        bkgd_color = [0.0, 0.0, 0.0]

        def cardinality(self):
            return 1

        def __iter__(self):
            yield {
                "rays_o": np.zeros((1, 16, 3), np.float32),
                "rays_d": np.tile(np.float32([0, 0, -1]), (1, 16, 1)),
                "t": np.tile(np.float32([0.0, 1.0]), (1, 16, 1)),
                "parameters": np.zeros((1, 7), np.float32),
                "cone_scale": np.full((1, 16, 1), 0.01, np.float32),
            }

    class ConstRenderer:
        def __call__(self, training=False, composite_bkgd=False, bkgd_color=None, **data):
            n = data["rays_o"].shape[1]
            return {
                "color_pred": np.full((1, n, 3), 1.5, np.float32),  # HDR value
                "alpha_pred": np.full((1, n), 0.5, np.float32),
            }

        def current_params(self):
            return {}

    logger = Logger(
        target_path=str(tmp_path),
        checkpoint_variables={},
        renderer=ConstRenderer(),
        dataset=TinyDataset(),
        is_training=False,
        write_exr=True,
    )
    import glob, os

    exrs = glob.glob(os.path.join(str(tmp_path), "**", "*.exr"), recursive=True)
    assert exrs, "logger wrote no .exr file"
    img = read_exr(exrs[0])
    assert img.shape == (4, 4, 4)
    # EXR output stays premultiplied HDR: exact values, no 1/255 quantization.
    np.testing.assert_array_equal(img[..., :3], np.full((4, 4, 3), 1.5, np.float32))
    np.testing.assert_array_equal(img[..., 3], np.full((4, 4), 0.5, np.float32))
    assert not glob.glob(os.path.join(str(tmp_path), "**", "*.npy"), recursive=True), (
        "npy sidecar fallback should be gone"
    )


def test_exr_folder_to_tfrecord_to_dataset(tmp_path):
    """End-to-end HDR path with real .exr files: write EXR renders + poses,
    convert via nerf2tfr (reads them with the vendored codec), load through
    the TFRecord dataset with read_exr=True — HDR values survive exactly."""
    import json

    from nerftex_tpu.tools.nerf2tfr import convert
    from nerftex_tpu.data.dataset import TFRecord

    rs = np.random.RandomState(0)
    imgs = []
    frames = []
    for i in range(3):
        img = (rs.rand(6, 6, 4).astype(np.float32) * 3.0)  # HDR range
        name = f"r_{i}"
        write_exr(str(tmp_path / f"{name}.exr"), img)
        imgs.append(img)
        frames.append({
            "file_path": name,
            "transform_matrix": np.eye(4).tolist(),
            "driver_parameters": {"A": 0.5, "B": float(i)},
        })
    with open(tmp_path / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.6, "frames": frames}, f)

    out = str(tmp_path / "tfr" / "train.tfr")
    written = convert(str(tmp_path), out, "train")
    assert written

    source, h, w, focal, composite_bkgd, _ = TFRecord(out, read_exr=True)
    assert (h, w) == (6, 6)
    assert composite_bkgd is False  # forced off for HDR (dataset.py:126-127)
    for i in range(3):
        rec = source[i]
        np.testing.assert_array_equal(rec["image"], imgs[i][..., :3])
        np.testing.assert_array_equal(rec["alpha"], imgs[i][..., 3])
        np.testing.assert_array_equal(rec["parameters"], [0.5, float(i)])
    assert rec["image"].max() > 1.0  # HDR survived (no 8-bit clamp)
