"""Full-scene inference: batched overlap-tile engine, mixer reassembly,
prediction writers.

Reference: utils/prediction_tools.py. The reference's hot loop is one
synchronous batch-1 ``model.predict`` per chip with host round-trips
(predict_chips, utils/prediction_tools.py:133-156); here the whole
extract -> forward -> crop -> stitch cycle is a single compiled XLA
program over batched chips.
"""

from satellite_computervision_tpu.inference.tiles import TiledInferenceEngine
from satellite_computervision_tpu.inference.tune import (
    GeometryTiming,
    candidate_geometries,
    tune_engine_geometry,
)
from satellite_computervision_tpu.inference.mixer import (
    MixerInfo,
    read_mixer,
    reassemble_patches,
)
from satellite_computervision_tpu.inference.writers import (
    write_tfrecord_predictions,
    predictions_to_examples,
)

__all__ = [
    "TiledInferenceEngine",
    "GeometryTiming",
    "candidate_geometries",
    "tune_engine_geometry",
    "MixerInfo",
    "read_mixer",
    "reassemble_patches",
    "write_tfrecord_predictions",
    "predictions_to_examples",
]
