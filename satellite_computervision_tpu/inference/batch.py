"""Batch prediction over EE-exported TFRecord patch files.

Reference: make_pred_dataset + doPrediction (utils/prediction_tools.py:
159-226, 602-729): list exported files, split tfrecord/json, process
tfrecords in chunks, write per-chunk prediction TFRecords for
``earthengine upload``. The reference predicts batch-1 per patch
(:224-226); here patches stream through the model in real batches on
device.
"""

from __future__ import annotations

import glob as _glob
import os
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from satellite_computervision_tpu.data.tfrecord import read_float_examples
from satellite_computervision_tpu.inference.mixer import MixerInfo
from satellite_computervision_tpu.inference.writers import write_tfrecord_predictions
from satellite_computervision_tpu.ops.normalize import rescale_image


def list_export_files(pattern_or_dir: str) -> Tuple[List[str], Optional[str]]:
    """Split an EE export listing into (sorted tfrecord files, mixer json)
    (utils/prediction_tools.py:620-652)."""
    if os.path.isdir(pattern_or_dir):
        entries = [os.path.join(pattern_or_dir, f) for f in os.listdir(pattern_or_dir)]
    else:
        entries = _glob.glob(pattern_or_dir)
    tfrecords = sorted(f for f in entries if ".tfrecord" in os.path.basename(f))
    mixers = [f for f in entries if f.endswith(".json")]
    return tfrecords, (mixers[0] if mixers else None)


def make_pred_batches(
    files: Sequence[str],
    features: Sequence[str],
    kernel_shape=(256, 256),
    kernel_buffer=(128, 128),
    batch_size: int = 8,
    axes=(0, 1),
    moments=None,
    splits=None,
    compression: Optional[str] = "GZIP",
):
    """Yield (B, side_y, side_x, C) patch batches from buffered EE
    prediction exports, rescaled per ``axes``/``moments``/``splits`` — the
    reference's make_pred_dataset returns normalized batches
    (utils/prediction_tools.py:159-226), so iterating this directly feeds
    model-ready values."""
    side_y = kernel_shape[0] + kernel_buffer[1]
    side_x = kernel_shape[1] + kernel_buffer[0]
    rescale = jax.jit(
        jax.vmap(
            lambda img: rescale_image(img, axes=axes, moments=moments, splits=splits)
        )
    )
    buf = []
    for path in files:
        for row in read_float_examples(path, features, compression):
            bands = np.stack(
                [row[f].reshape(side_y, side_x) for f in features], axis=-1
            )
            buf.append(bands)
            if len(buf) == batch_size:
                yield np.asarray(rescale(jnp.stack(buf)))
                buf = []
    if buf:
        yield np.asarray(rescale(jnp.stack(buf)))


def run_batch_prediction(
    pattern_or_dir: str,
    predict_fn: Callable,
    features: Sequence[str],
    out_dir: str,
    out_base: str,
    kernel_shape=(256, 256),
    kernel_buffer=(128, 128),
    batch_size: int = 8,
    files_per_chunk: int = 100,
    axes=(0, 1),
    moments=None,
    splits=None,
    compression: Optional[str] = "GZIP",
) -> List[str]:
    """The doPrediction flow (utils/prediction_tools.py:602-729) on local/
    mounted storage: chunk the export files, predict each chunk batched on
    device, write one prediction TFRecord per chunk. Returns the written
    paths (upload with ``earthengine upload image ... {files} {mixer}``).
    """
    files, _ = list_export_files(pattern_or_dir)
    if not files:
        raise FileNotFoundError(f"no tfrecord files under {pattern_or_dir!r}")
    os.makedirs(out_dir, exist_ok=True)

    written = []
    for ci in range(0, len(files), files_per_chunk):
        chunk = files[ci : ci + files_per_chunk]
        preds = []
        # batches arrive already rescaled (make_pred_batches applies
        # axes/moments/splits, matching reference make_pred_dataset)
        for batch in make_pred_batches(
            chunk, features, kernel_shape, kernel_buffer, batch_size,
            axes, moments, splits, compression,
        ):
            preds.append(np.asarray(predict_fn(jnp.asarray(batch))))
        predictions = np.concatenate(preds, axis=0)
        out_path = os.path.join(out_dir, f"{out_base}-{ci // files_per_chunk:05d}.tfrecords")
        write_tfrecord_predictions(
            predictions, out_path, kernel_shape=kernel_shape, kernel_buffer=kernel_buffer
        )
        written.append(out_path)
    return written


def get_img_bounds(image_shape, mixer: MixerInfo, dst_crs=None):
    """[[south, west], [north, east]] bounds of a reassembled prediction
    (utils/prediction_tools.py:560-600). With ``dst_crs`` (e.g.
    ``"EPSG:4326"`` for folium, the reference's transform branch at
    :584-597) bounds are reprojected from the mixer CRS via the
    self-contained geo.crs transforms (UTM/web-mercator/lon-lat)."""
    from satellite_computervision_tpu.geo.transforms import array_bounds

    h, w = image_shape[:2]
    left, bottom, right, top = array_bounds(h, w, mixer.affine)
    if dst_crs is not None:
        from satellite_computervision_tpu.geo.crs import transform_bounds

        left, bottom, right, top = transform_bounds(
            left, bottom, right, top, mixer.crs, dst_crs
        )
    return [[bottom, left], [top, right]]
