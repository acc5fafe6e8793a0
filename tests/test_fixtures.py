"""The public fixture generators produce format-correct artifacts that the
framework's own readers consume end-to-end."""

import numpy as np

from satellite_computervision_tpu import testing as fx
from satellite_computervision_tpu.data import ChipDataset, get_file_id
from satellite_computervision_tpu.data.chip_generators import ChipSource, UNetChipDataset
from satellite_computervision_tpu.inference.batch import (
    list_export_files,
    make_pred_batches,
)
from satellite_computervision_tpu.inference.mixer import read_mixer, reassemble_patches


def test_training_fixture_parses(tmp_path):
    path = str(tmp_path / "t.tfrecord")
    fx.make_training_tfrecord(path, n_examples=5, kernel=16)
    ds = ChipDataset([path], ["B2", "B3", "B4", "B8", "landcover"], kernel_size=16)
    rows = list(ds)
    assert len(rows) == 5
    assert rows[0]["landcover"].shape == (16, 16)
    assert set(np.unique(rows[0]["landcover"])) <= {0.0, 1.0}


def test_prediction_export_roundtrip(tmp_path):
    paths, mixer_path = fx.make_prediction_export(
        str(tmp_path), rows=2, cols=3, kernel=16, buffer=8, files=2
    )
    files, found_mixer = list_export_files(str(tmp_path))
    assert files == sorted(paths) and found_mixer == mixer_path
    mixer = read_mixer(mixer_path)
    assert mixer.total_patches == 6 and mixer.scene_shape == (32, 48)

    batches = list(
        make_pred_batches(files, ["B2", "B3", "B4", "B8"],
                          kernel_shape=(16, 16), kernel_buffer=(8, 8), batch_size=4)
    )
    patches = np.concatenate(batches)
    assert patches.shape == (6, 24, 24, 4)
    scene = reassemble_patches(patches, mixer, (8, 8))
    assert scene.shape == (32, 48, 4)


def test_npy_tree_feeds_generator(tmp_path):
    tree = fx.make_npy_chip_tree(str(tmp_path), n_chips=4, dim=16)
    # filenames carry the id convention the matchers slice
    assert get_file_id(tree["naip"][0]) == ("000", "x")
    ds = UNetChipDataset(
        sources={"naip": ChipSource.named("naip", tree["naip"])},
        label_files=tree["label"],
        batch_size=2,
        unet_dim=(16, 16),
        n_classes=11,
    )
    x, y = ds[0]
    assert x.shape == (2, 16, 16, 4) and y.shape == (2, 16, 16, 11)
