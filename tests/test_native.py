"""Native (C++) fastrecord codec vs the pure-Python reference."""

import gzip
import io

import numpy as np
import pytest

from satellite_computervision_tpu import native
from satellite_computervision_tpu.data.tfrecord import (
    TFRecordWriter,
    build_example,
    read_float_examples,
    write_tfrecord_file,
)


def _py_crc32c(data):
    # independent table implementation for cross-checking
    poly = 0x82F63B78
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
        table.append(crc)
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


needs_native = pytest.mark.skipif(
    native.get_lib() is None, reason="g++ unavailable; native codec not built"
)


@needs_native
def test_native_crc32c_vectors():
    assert native.crc32c(b"123456789") == 0xE3069283
    assert native.crc32c(bytes(32)) == 0x8A9136AA
    for blob in [b"", b"x", b"hello world" * 100, bytes(range(256)) * 33]:
        assert native.crc32c(blob) == _py_crc32c(blob)


@needs_native
def test_native_split_and_feature(tmp_path, rng):
    path = str(tmp_path / "x.tfrecord")
    bands = [rng.normal(size=64).astype(np.float32) for _ in range(3)]
    write_tfrecord_file(
        path, [{"B2": b, "label": np.ones(4, np.float32)} for b in bands], None
    )
    blob = open(path, "rb").read()
    offsets, lengths = native.split_records(blob, verify=True)
    assert len(offsets) == 3
    rec = blob[offsets[1] : offsets[1] + lengths[1]]
    arr = native.find_float_feature(rec, "B2")
    np.testing.assert_array_equal(arr, bands[1])
    assert native.find_float_feature(rec, "missing") is None


@needs_native
def test_native_frame_record_matches_python():
    payload = build_example({"a": np.arange(8, dtype=np.float32)})
    framed = native.frame_record(payload)
    bio = io.BytesIO()
    with TFRecordWriter(bio, None) as w:
        w.write(payload)
    assert framed == bio.getvalue()


@needs_native
def test_native_corruption_detected(tmp_path):
    path = str(tmp_path / "x.tfrecord")
    write_tfrecord_file(path, [{"a": np.arange(4, dtype=np.float32)}], None)
    blob = bytearray(open(path, "rb").read())
    blob[-6] ^= 0xFF
    with pytest.raises(IOError):
        native.split_records(bytes(blob), verify=True)


@pytest.mark.parametrize("compression", [None, "GZIP"])
def test_read_float_examples_both_paths(tmp_path, rng, compression):
    """The bulk reader returns identical data with and without the native
    library in play (fallback parity)."""
    path = str(tmp_path / "c.tfrecord")
    examples = [
        {"B2": rng.normal(size=16).astype(np.float32),
         "y": rng.normal(size=16).astype(np.float32)}
        for _ in range(4)
    ]
    write_tfrecord_file(path, examples, compression)
    rows = read_float_examples(path, ["B2", "y"], compression)
    assert len(rows) == 4
    for orig, row in zip(examples, rows):
        np.testing.assert_array_equal(row["B2"], orig["B2"])
        np.testing.assert_array_equal(row["y"], orig["y"])


def test_native_lzw_matches_python_both_directions(monkeypatch, rng):
    """Native LZW encode/decode and the pure-Python twins are
    bit-interchangeable, across the 9->12-bit width bumps and the
    table-full reset; corrupt streams raise."""
    from satellite_computervision_tpu.geo import geotiff as gt

    if native.get_lib() is None:
        pytest.skip("no compiler for the native library")

    cases = [
        rng.integers(0, 256, 70000, dtype=np.uint8).tobytes(),  # 9->12 bits
        rng.integers(0, 6, 400000, dtype=np.uint8).tobytes(),   # table resets
        (b"A" * 4096 + bytes(range(256)) * 16) * 4,
        b"", b"x",
    ]
    for data in cases:
        enc_native = native.lzw_encode(data)
        # force the pure-Python encoder
        monkeypatch.setattr(native, "lzw_encode", lambda d: None)
        enc_py = gt._lzw_encode(data)
        monkeypatch.undo()
        assert enc_native == enc_py  # bit-identical streams
        assert gt._lzw_decode(enc_native) == data          # python decode
        assert native.lzw_decode(enc_native, len(data)) == data  # native

    with pytest.raises(ValueError):
        native.lzw_decode(b"\x00\x00\xff\xff\xff\xff", 64)


def test_lzw_eoi_width_at_table_boundary():
    """Regression (round 5): the final data code adds no encoder table
    entry, but the decoder appends one for it and widens when its table
    hits 2^nbits - 1 — so EOI must be emitted at the widened width. With
    the old encoder this desynced exactly when the last code landed on
    the boundary (surfaced as a corrupted 8192^2 LZW scene in
    examples/swath_codec_sweep.py). Sweep lengths densely across the
    9->10 bit boundary so the final code lands on every alignment."""
    from satellite_computervision_tpu.geo import geotiff as gt

    base = bytes(range(256)) + bytes(range(0, 256, 2)) + bytes(range(1, 256, 2))
    for n in range(240, 530):
        data = base[:n]
        enc = gt._lzw_encode(data)
        assert gt._lzw_decode(enc) == data, f"python decode desync at n={n}"
        if native.get_lib() is not None:
            assert native.lzw_decode(enc, n) == data, f"native desync at n={n}"
