"""npy chip generator datasets (UNET / Siamese / LSTM / autoencoder / hybrid)."""

import numpy as np
import pytest

from satellite_computervision_tpu.data.chip_generators import (
    ChipSource,
    HybridChipDataset,
    LSTMAutoencoderChipDataset,
    LSTMChipDataset,
    SiameseChipDataset,
    UNetChipDataset,
    rearrange_timeseries,
    split_timeseries,
)

DIM = 8
N = 6


@pytest.fixture
def chip_dirs(tmp_path, rng):
    """Synthetic per-source npy chips mirroring the PC export layout."""
    paths = {}
    for src, c, scale in [("naip", 4, 255.0), ("s2", 4, 10000.0), ("dem", 1, 2000.0)]:
        d = tmp_path / src
        d.mkdir()
        files = []
        for i in range(N):
            arr = (rng.uniform(0, 1, (c, DIM, DIM)) * scale).astype(np.float32)
            f = d / f"a_b_0_{i}_x.npy"
            np.save(f, arr)
            files.append(str(f))
        paths[src] = files
    label_dir = tmp_path / "label"
    label_dir.mkdir()
    labels = []
    for i in range(N):
        arr = rng.integers(0, 8, (1, DIM, DIM)).astype(np.uint8)
        f = label_dir / f"a_b_0_{i}_x.npy"
        np.save(f, arr)
        labels.append(str(f))
    paths["label"] = labels
    return paths


def test_unet_chip_dataset(chip_dirs):
    ds = UNetChipDataset(
        sources={
            "naip": ChipSource.named("naip", chip_dirs["naip"]),
            "dem": ChipSource.named("dem", chip_dirs["dem"]),
        },
        label_files=chip_dirs["label"],
        batch_size=2,
        unet_dim=(DIM, DIM),
        n_classes=11,
        seed=1,
    )
    assert len(ds) == 3
    x, y = ds[0]
    # naip 4ch + dem 1ch + dem mask 1ch
    assert x.shape == (2, DIM, DIM, 6)
    assert y.shape == (2, DIM, DIM, 11)
    np.testing.assert_allclose(y.sum(-1), 1.0, rtol=1e-6)
    # naip rescaled by 255 -> within [0,1] before color aug (aug is ±5%)
    assert x[..., :4].max() <= 1.2


def test_unet_chip_dataset_lc_transitions(chip_dirs):
    ds = UNetChipDataset(
        sources={"naip": ChipSource.named("naip", chip_dirs["naip"])},
        label_files=chip_dirs["label"],
        batch_size=2,
        unet_dim=(DIM, DIM),
        n_classes=11,
        lc_transitions=[(7, 0)],
        lu_transitions=None,
        shuffle=False,
        seed=0,
        to_fit=False,
    )
    # to_fit False: returns features only
    x = ds[0]
    assert x.shape == (2, DIM, DIM, 4)


def test_siamese_chip_dataset(tmp_path, rng):
    before, after, labels = [], [], []
    for i in range(4):
        b = tmp_path / f"b_{i}.npy"
        a = tmp_path / f"a_{i}.npy"
        l = tmp_path / f"l_{i}.npy"
        np.save(b, (rng.uniform(0, 1, (4, DIM, DIM)) * 10000).astype(np.float32))
        np.save(a, (rng.uniform(0, 1, (4, DIM, DIM)) * 10000).astype(np.float32))
        np.save(l, rng.integers(0, 4, (1, DIM, DIM)).astype(np.uint8))
        before.append(str(b)); after.append(str(a)); labels.append(str(l))
    ds = SiameseChipDataset(before, after, labels, batch_size=2, unet_dim=(DIM, DIM))
    (xb, xa), y = ds[0]
    assert xb.shape == (2, DIM, DIM, 4)
    assert xa.shape == (2, DIM, DIM, 4)
    assert y.shape == (2, DIM, DIM, 1)
    assert set(np.unique(y)) <= {0.0, 1.0}  # labels binarized (class>1 -> 1)


def test_siamese_nan_mask(tmp_path, rng):
    before, after, labels = [], [], []
    for i in range(2):
        arr = (rng.uniform(0, 1, (2, DIM, DIM)) * 10000).astype(np.float32)
        arr[0, 0, 0] = np.nan
        np.save(tmp_path / f"b_{i}.npy", arr)
        np.save(tmp_path / f"a_{i}.npy", arr)
        np.save(tmp_path / f"l_{i}.npy", np.ones((1, DIM, DIM), np.uint8) * 2)
        before.append(str(tmp_path / f"b_{i}.npy"))
        after.append(str(tmp_path / f"a_{i}.npy"))
        labels.append(str(tmp_path / f"l_{i}.npy"))
    ds = SiameseChipDataset(before, after, labels, add_nan_mask=True, batch_size=2,
                            unet_dim=(DIM, DIM), shuffle=False)
    (xb, xa), y = ds[0]
    assert np.isfinite(xb).all() and np.isfinite(xa).all()
    # the nan pixel's label is zeroed by the joint mask
    assert float(y.sum()) < 2 * DIM * DIM


def _series_files(tmp_path, rng, n=4, t=6, c=3):
    files = []
    for i in range(n):
        arr = (rng.uniform(0, 1, (t, c, DIM, DIM)) * 10000).astype(np.float32)
        f = tmp_path / f"ts_ts_{i + 1}_{i}.npy"
        np.save(f, arr)
        files.append(str(f))
    return files


def test_lstm_chip_dataset(tmp_path, rng):
    files = _series_files(tmp_path, rng, t=6)
    ds = LSTMChipDataset(files, batch_size=2, dim=(DIM, DIM), n_channels=3,
                         n_timesteps=6, seed=0)
    feats, labels = ds[0]
    assert feats.shape == (2, 5, DIM, DIM, 3)
    assert labels.shape == (2, DIM, DIM, 3)
    assert feats.max() <= 1.0 + 1e-6


def test_lstm_autoencoder_dataset(tmp_path, rng):
    files = _series_files(tmp_path, rng, t=7)
    ds = LSTMAutoencoderChipDataset(
        files, batch_size=2, dim=(DIM, DIM), n_channels=3, n_timesteps=6,
        harmonics=True, sample_weights=True, seed=0,
    )
    [feats, harmonics], [temporal_y, y], weights = ds[0]
    assert feats.shape == (2, 6, DIM, DIM, 3)
    assert temporal_y.shape == feats.shape
    np.testing.assert_array_equal(temporal_y, np.flip(feats, axis=1))
    assert y.shape == (2, DIM, DIM, 3)
    assert harmonics.shape == (2, DIM, DIM, 2)
    assert weights[1].shape == y.shape


def test_lstm_chip_dataset_all_empty_labels_raise(tmp_path):
    # a series that is zero at EVERY timestep can never yield a valid
    # next-step label — after the 8 rotation retries the dataset must
    # raise, not silently train on an all-zero target (the reference
    # falls through silently, utils/processing.py:944-960)
    files = []
    for i in range(2):
        f = tmp_path / f"ts_ts_{i + 1}_{i}.npy"
        np.save(f, np.zeros((6, 3, DIM, DIM), np.float32))
        files.append(str(f))
    ds = LSTMChipDataset(files, batch_size=2, dim=(DIM, DIM), n_channels=3,
                         n_timesteps=6, seed=0)
    with pytest.raises(ValueError, match="all-empty next-step labels"):
        ds[0]
    # to_fit=False (inference) still serves the raw series
    ds_infer = LSTMChipDataset(files, batch_size=2, dim=(DIM, DIM),
                               n_channels=3, n_timesteps=6, seed=0,
                               to_fit=False)
    assert ds_infer[0].shape == (2, 6, DIM, DIM, 3)


def test_rearrange_and_split():
    rng = np.random.default_rng(0)
    batch = rng.normal(size=(2, 5, 4, 4, 3)).astype(np.float32)
    rearranged, start = rearrange_timeseries(batch, rng)
    assert rearranged.shape == batch.shape
    np.testing.assert_array_equal(rearranged[:, 0], batch[:, start])
    feats, labels = split_timeseries(rearranged, 2)
    assert feats.shape == (2, 4, 4, 4, 3)
    assert labels.shape == (2, 4, 4, 2)


def test_hybrid_chip_dataset(chip_dirs, tmp_path, rng):
    s2series = _series_files(tmp_path, rng, n=N, t=6, c=4)
    ds = HybridChipDataset(
        sources={"naip": ChipSource.named("naip", chip_dirs["naip"])},
        s2_series_files=s2series,
        lstm_dim=(6, DIM, DIM, 4),
        label_files=chip_dirs["label"],
        batch_size=2,
        unet_dim=(DIM, DIM),
        n_classes=11,
        seed=0,
    )
    [unet_x, lstm_x], y = ds[0]
    assert unet_x.shape == (2, DIM, DIM, 4)
    assert lstm_x.shape == (2, 6, DIM, DIM, 4)
    assert y.shape == (2, DIM, DIM, 11)
