"""Host-side ingestion: TFRecord + .npy chip readers feeding device prefetch.

Reference: the tf.data pipelines and Keras Sequence generators in
utils/processing.py. Here ingestion is TF-free: a self-contained TFRecord/
Example codec (EE export schema), file-ID matching, chip datasets, and a
double-buffered host->device prefetcher.
"""

from satellite_computervision_tpu.data.tfrecord import (
    TFRecordReader,
    TFRecordWriter,
    read_tfrecord_file,
    write_tfrecord_file,
    parse_example,
    build_example,
)
from satellite_computervision_tpu.data.matching import get_file_id, match_files, split_files
from satellite_computervision_tpu.data.pipeline import (
    ChipDataset,
    get_training_dataset,
    get_eval_dataset,
    prefetch_to_device,
)

__all__ = [
    "TFRecordReader",
    "TFRecordWriter",
    "read_tfrecord_file",
    "write_tfrecord_file",
    "parse_example",
    "build_example",
    "get_file_id",
    "match_files",
    "split_files",
    "ChipDataset",
    "get_training_dataset",
    "get_eval_dataset",
    "prefetch_to_device",
]
