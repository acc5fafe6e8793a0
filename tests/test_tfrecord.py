import numpy as np
import pytest

from satellite_computervision_tpu.data.tfrecord import (
    TFRecordReader,
    TFRecordWriter,
    build_example,
    crc32c,
    masked_crc32c,
    parse_example,
    read_tfrecord_file,
    write_tfrecord_file,
)


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert crc32c(b"") == 0x0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_example_roundtrip_floats(rng):
    band = rng.normal(size=(8, 8)).astype(np.float32)
    blob = build_example({"B2": band.reshape(-1), "label": np.array([1.0], np.float32)})
    parsed = parse_example(blob)
    np.testing.assert_array_equal(parsed["B2"], band.reshape(-1))
    np.testing.assert_array_equal(parsed["label"], [1.0])


def test_example_roundtrip_ints_and_bytes():
    blob = build_example({"count": np.array([3, -2, 1 << 40]), "name": [b"abc", b"d"]})
    parsed = parse_example(blob)
    np.testing.assert_array_equal(parsed["count"], [3, -2, 1 << 40])
    assert parsed["name"] == [b"abc", b"d"]


@pytest.mark.parametrize("compression", [None, "GZIP"])
def test_tfrecord_file_roundtrip(tmp_path, rng, compression):
    path = str(tmp_path / "chips.tfrecord")
    examples = [
        {"B2": rng.normal(size=16).astype(np.float32), "y": np.array([float(i)])}
        for i in range(5)
    ]
    write_tfrecord_file(path, examples, compression)
    back = read_tfrecord_file(path, compression, verify_crc=True)
    assert len(back) == 5
    for orig, rt in zip(examples, back):
        np.testing.assert_allclose(rt["B2"], orig["B2"], rtol=1e-6)
        np.testing.assert_array_equal(rt["y"], orig["y"])


def test_crc_detects_corruption(tmp_path):
    path = str(tmp_path / "x.tfrecord")
    write_tfrecord_file(path, [{"a": np.arange(4, dtype=np.float32)}], None)
    blob = bytearray(open(path, "rb").read())
    blob[-6] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(blob))
    with pytest.raises(IOError):
        read_tfrecord_file(path, None, verify_crc=True)


@pytest.mark.tf_parity
def test_tf_can_read_our_records(tmp_path, rng):
    """Our TFRecord+Example bytes must be readable by TensorFlow itself
    (EE-ingest compatibility). Slow: imports TF."""
    import os

    if not os.environ.get("SCV_TF_PARITY"):
        pytest.skip("set SCV_TF_PARITY=1 to run TF parity tests")
    import tensorflow as tf

    path = str(tmp_path / "parity.tfrecord")
    band = rng.normal(size=(4, 4)).astype(np.float32)
    write_tfrecord_file(path, [{"B2": band.reshape(-1)}], "GZIP")
    ds = tf.data.TFRecordDataset([path], compression_type="GZIP")
    rec = next(iter(ds))
    parsed = tf.io.parse_single_example(
        rec, {"B2": tf.io.FixedLenFeature([4, 4], tf.float32)}
    )
    np.testing.assert_allclose(parsed["B2"].numpy(), band, rtol=1e-6)
