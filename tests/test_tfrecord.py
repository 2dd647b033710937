import os

import numpy as np
import pytest

from nerftex_tpu.data import tfrecord as tfr


def test_record_roundtrip(tmp_path):
    path = str(tmp_path / "test.tfr")
    payloads = [b"hello", b"", b"x" * 1000]
    tfr.write_records(path, payloads)
    out = list(tfr.read_records(path, verify_crc=True))
    assert out == payloads


@pytest.mark.parametrize("compression", [None, "GZIP", "ZLIB"])
def test_record_compression(tmp_path, compression):
    path = str(tmp_path / "c.tfr")
    tfr.write_records(path, [b"abc", b"def"], compression_type=compression)
    assert list(tfr.read_records(path, compression_type=compression)) == [b"abc", b"def"]


def test_example_roundtrip():
    ex = tfr.build_example(
        {
            "image": b"\x89PNGfakebytes",
            "angle": 0.63,
            "count": np.asarray([3, 7], np.int64),
            "vec": np.asarray([1.5, -2.5], np.float32),
        }
    )
    parsed = tfr.parse_example(ex)
    assert parsed["image"] == b"\x89PNGfakebytes"
    np.testing.assert_allclose(parsed["angle"], [0.63], atol=1e-6)
    np.testing.assert_array_equal(parsed["count"], [3, 7])
    np.testing.assert_allclose(parsed["vec"], [1.5, -2.5], atol=1e-6)


def test_tensor_roundtrip():
    arr = np.random.RandomState(0).rand(4, 4).astype(np.float32)
    out = tfr.parse_tensor(tfr.serialize_tensor(arr))
    np.testing.assert_array_equal(out, arr)
    # scalar-ish vectors too
    vec = np.asarray([1, 2, 3], np.int64)
    np.testing.assert_array_equal(tfr.parse_tensor(tfr.serialize_tensor(vec)), vec)


def test_interop_with_tensorflow(tmp_path):
    tf = pytest.importorskip("tensorflow")

    # TF writes, we read.
    pose = np.random.RandomState(1).rand(4, 4).astype(np.float32)
    feature = {
        "image": tf.train.Feature(bytes_list=tf.train.BytesList(value=[b"imgbytes"])),
        "pose": tf.train.Feature(
            bytes_list=tf.train.BytesList(value=[tf.io.serialize_tensor(pose).numpy()])
        ),
        "angle": tf.train.Feature(float_list=tf.train.FloatList(value=[0.55])),
    }
    example = tf.train.Example(features=tf.train.Features(feature=feature))
    path = str(tmp_path / "tfwrite.tfr")
    with tf.io.TFRecordWriter(path) as w:
        w.write(example.SerializeToString())

    records = list(tfr.read_records(path, verify_crc=True))
    assert len(records) == 1
    parsed = tfr.parse_example(records[0])
    assert parsed["image"] == b"imgbytes"
    np.testing.assert_allclose(parsed["angle"], [0.55], atol=1e-6)
    np.testing.assert_array_equal(tfr.parse_tensor(parsed["pose"]), pose)

    # We write, TF reads.
    path2 = str(tmp_path / "ourwrite.tfr")
    payload = tfr.build_example(
        {"pose": tfr.serialize_tensor(pose), "angle": 0.55, "image": b"imgbytes"}
    )
    tfr.write_records(path2, [payload])
    ds = tf.data.TFRecordDataset(path2)
    for raw in ds:
        ex = tf.io.parse_single_example(
            raw,
            {
                "image": tf.io.FixedLenFeature([], tf.string),
                "pose": tf.io.FixedLenFeature([], tf.string),
                "angle": tf.io.FixedLenFeature([], tf.float32),
            },
        )
        assert ex["image"].numpy() == b"imgbytes"
        np.testing.assert_allclose(float(ex["angle"]), 0.55, atol=1e-6)
        np.testing.assert_array_equal(
            tf.io.parse_tensor(ex["pose"], tf.float32).numpy(), pose
        )
