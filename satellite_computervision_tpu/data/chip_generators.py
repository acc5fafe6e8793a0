"""Multi-source .npy chip datasets (the reference's five Keras generators).

Reference: UNETDataGenerator / SiameseDataGenerator / LSTMDataGenerator /
LSTMAutoencoderGenerator / HybridDataGenerator
(utils/processing.py:456-1184). Same behaviors, re-architected:

- host side does only IO + layout (CHW->HWC, trim, stack); all numeric
  augmentation runs through the jittable ops under explicit PRNG keys, so
  batches are reproducible and the augment can fuse on device;
- randomness (shuffle order, NaN fill, augmentation, sequence rotation) is
  seeded — the reference uses process-global RNGs;
- a skipped batch (shape/NaN asserts, utils/processing.py:596-598,739-740)
  raises or is filtered explicitly rather than silently yielding None.

Per-source rescale divisors match the reference: NAIP/255, S2/10000,
HAG & LiDAR/100, DEM/2000, S1/-50 (utils/processing.py:601-650, 1116).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from satellite_computervision_tpu.cloud.blob import load_numpy
from satellite_computervision_tpu.ops.augment import apply_morph, aug_color, draw_morph_params
from satellite_computervision_tpu.ops.classes import merge_classes
from satellite_computervision_tpu.ops.harmonics import make_harmonics

# Reference class transitions (utils/processing.py:466-467)
DEFAULT_LC_TRANSITIONS = [(12, 3), (11, 3), (10, 3), (9, 8), (255, 0)]
DEFAULT_LU_TRANSITIONS = [(82, 9), (84, 10)]

RESCALE_DIVISORS = {
    "naip": 255.0,
    "s2": 10000.0,
    "hag": 100.0,
    "lidar": 100.0,
    "dem": 2000.0,
    "s1": -50.0,
    "ssurgo": None,
}

# Sources whose invalid pixels get masked + random-filled
MASKED_SOURCES = ("hag", "lidar", "dem")
# Sources that receive color augmentation when fitting
COLOR_AUG_SOURCES = ("naip", "s2")


def _to_chw(arr: np.ndarray) -> np.ndarray:
    """Ensure (C, H, W): PC chips arrive CHW but some are HWC
    (utils/processing.py:549-551's heuristic: channels is the small axis)."""
    if arr.shape[-1] < arr.shape[0]:
        return np.moveaxis(arr, -1, 0)
    return arr


def _center_trim_hw(arr: np.ndarray, dim: Tuple[int, int], h_axis: int) -> np.ndarray:
    th = (arr.shape[h_axis] - dim[0]) // 2
    tw = (arr.shape[h_axis + 1] - dim[1]) // 2
    slicer = [slice(None)] * arr.ndim
    slicer[h_axis] = slice(th, th + dim[0])
    slicer[h_axis + 1] = slice(tw, tw + dim[1])
    return arr[tuple(slicer)]


@dataclasses.dataclass
class ChipSource:
    """One variable's chip files + preprocessing policy."""

    files: Sequence[str]
    divisor: Optional[float] = None
    nan_mask: bool = False
    color_aug: bool = False

    @staticmethod
    def named(name: str, files: Sequence[str]) -> "ChipSource":
        return ChipSource(
            files=files,
            divisor=RESCALE_DIVISORS.get(name),
            nan_mask=name in MASKED_SOURCES,
            color_aug=name in COLOR_AUG_SOURCES,
        )


class _BaseChipDataset:
    def __init__(self, n_items: int, batch_size: int, shuffle: bool, seed: int, to_fit: bool):
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.to_fit = to_fit
        self._n_items = n_items
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.key(seed)
        self.on_epoch_end()

    def __len__(self) -> int:
        return self._n_items // self.batch_size

    def on_epoch_end(self):
        self.indexes = np.arange(self._n_items)
        if self.shuffle:
            self._rng.shuffle(self.indexes)

    def _batch_indexes(self, index: int) -> np.ndarray:
        return self.indexes[index * self.batch_size : (index + 1) * self.batch_size]

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
        self.on_epoch_end()


class UNetChipDataset(_BaseChipDataset):
    """Multi-source UNET chip batches (utils/processing.py:456-755).

    ``sources`` is an ordered {name: ChipSource} dict; label/lu files are
    separate. Yields (feats, one_hot_labels) with joint morph augmentation
    when ``to_fit``.
    """

    def __init__(
        self,
        sources: Dict[str, ChipSource],
        label_files: Optional[Sequence[str]] = None,
        lu_files: Optional[Sequence[str]] = None,
        batch_size: int = 32,
        unet_dim: Tuple[int, int] = (256, 256),
        n_classes: int = 8,
        shuffle: bool = True,
        to_fit: bool = True,
        lc_transitions=tuple(DEFAULT_LC_TRANSITIONS),
        lu_transitions=tuple(DEFAULT_LU_TRANSITIONS),
        seed: int = 0,
    ):
        self.sources = sources
        self.label_files = label_files
        self.lu_files = lu_files
        self.unet_dim = unet_dim
        self.n_classes = n_classes
        self.lc_transitions = list(lc_transitions) if lc_transitions else None
        self.lu_transitions = list(lu_transitions) if lu_transitions else None
        n_items = len(label_files if label_files is not None else next(iter(sources.values())).files)
        super().__init__(n_items, batch_size, shuffle, seed, to_fit)

    # ------------------------------------------------------------------
    def _load_source(self, source: ChipSource, idxs: np.ndarray) -> np.ndarray:
        """Load -> CHW -> divide -> nan mask/fill -> trim -> HWC stack
        (utils/processing.py:543-598)."""
        arrays = [_to_chw(np.asarray(load_numpy(source.files[k]), np.float32)) for k in idxs]
        if source.divisor:
            arrays = [a / source.divisor for a in arrays]
        batch = np.stack(arrays)  # (B, C, H, W)
        if source.nan_mask:
            # mask channel is appended in BOTH fit and predict modes so the
            # model input width is stable (utils/processing.py:553-584);
            # invalid pixels are random-filled only while fitting
            invalid = ~np.isfinite(batch) | (batch < -5000)
            mask = invalid.any(axis=1, keepdims=True).astype(np.float32)  # (B,1,H,W)
            if self.to_fit:
                fill = self._rng.standard_normal(batch.shape).astype(np.float32)
                batch = np.where(invalid, fill, batch)
            batch = np.concatenate([batch, mask], axis=1)
        if not np.isfinite(batch).all():
            raise ValueError("NaNs in batch (source without nan_mask)")
        batch = _center_trim_hw(batch, self.unet_dim, h_axis=2)
        return np.moveaxis(batch, 1, 3)  # (B, H, W, C)

    def _process_y(self, idxs: np.ndarray) -> np.ndarray:
        """Labels: lc reclass + lu overlay + trim + one-hot
        (utils/processing.py:652-697)."""
        lc = np.stack([np.asarray(load_numpy(self.label_files[k])) for k in idxs]).astype(int)
        if self.lc_transitions:
            lc = np.asarray(merge_classes(lc, self.lc_transitions))
        if self.lu_files is not None and self.lu_transitions:
            lu = np.stack([np.asarray(load_numpy(self.lu_files[k])) for k in idxs]).astype(int)
            lc = np.asarray(merge_classes(lu, self.lu_transitions, out_array=lc))
        lc = _center_trim_hw(lc, self.unet_dim, h_axis=2)  # (B, 1, H, W)
        lc = np.squeeze(lc, axis=1)
        return np.eye(self.n_classes, dtype=np.float32)[lc]  # (B, H, W, n_classes)

    def __getitem__(self, index: int):
        idxs = self._batch_indexes(index)
        pieces = []
        for source in self.sources.values():
            data = self._load_source(source, idxs)
            if source.color_aug and self.to_fit:
                data = np.asarray(aug_color(self._next_key(), jnp.asarray(data), nan_aware=True))
            pieces.append(data)
        x = np.concatenate(pieces, axis=-1)
        if not self.to_fit:
            return x
        y = self._process_y(idxs)
        params = draw_morph_params(self._next_key())
        x = np.asarray(apply_morph(jnp.asarray(x), *params))
        y = np.asarray(apply_morph(jnp.asarray(y), *params))
        return x, y


class SiameseChipDataset(_BaseChipDataset):
    """Before/after chip pairs for change detection
    (SiameseDataGenerator, utils/processing.py:757-892)."""

    def __init__(
        self,
        before_files: Sequence[str],
        after_files: Sequence[str],
        label_files: Sequence[str],
        add_nan_mask: bool = False,
        batch_size: int = 32,
        unet_dim: Tuple[int, int] = (256, 256),
        divisor: float = 10000.0,
        shuffle: bool = True,
        to_fit: bool = True,
        seed: int = 0,
    ):
        self.before_files = before_files
        self.after_files = after_files
        self.label_files = label_files
        self.add_nan_mask = add_nan_mask
        self.unet_dim = unet_dim
        self.divisor = divisor
        super().__init__(len(label_files), batch_size, shuffle, seed, to_fit)

    def _load_pairside(self, files: Sequence[str], idxs: np.ndarray):
        arrays = [_to_chw(np.asarray(load_numpy(files[k]), np.float32)) for k in idxs]
        batch = np.stack(arrays) / self.divisor
        batch = _center_trim_hw(batch, self.unet_dim, h_axis=2)
        batch = np.moveaxis(batch, 1, 3)  # (B, H, W, C)
        if self.add_nan_mask:
            invalid = ~np.isfinite(batch) | (batch < -1)
            mask = 1.0 - invalid.any(axis=-1, keepdims=True).astype(np.float32)
            batch = np.where(invalid, self._rng.random(batch.shape).astype(np.float32), batch)
        else:
            if not np.isfinite(batch).all():
                raise ValueError("NaNs in batch, enable add_nan_mask")
            mask = None
        if self.to_fit:
            batch = np.asarray(aug_color(self._next_key(), jnp.asarray(batch), nan_aware=True))
        return batch, mask

    def _process_y(self, idxs: np.ndarray) -> np.ndarray:
        """Binary labels: any class > 1 -> 1 (utils/processing.py:820-840)."""
        lc = np.stack(
            [np.squeeze(np.asarray(load_numpy(self.label_files[k]))) for k in idxs]
        ).astype(int)
        binary = np.where(lc > 1, 1, lc)
        binary = _center_trim_hw(binary, self.unet_dim, h_axis=1)
        return binary[..., None].astype(np.float32)

    def __getitem__(self, index: int):
        idxs = self._batch_indexes(index)
        before, mask_b = self._load_pairside(self.before_files, idxs)
        after, mask_a = self._load_pairside(self.after_files, idxs)
        if not self.to_fit:
            return [before, after]
        labels = self._process_y(idxs)
        if self.add_nan_mask:
            joint = np.minimum(mask_b, mask_a)
            labels = labels * joint
        c = before.shape[-1]
        stacked = np.concatenate([before, after, labels], axis=-1)
        params = draw_morph_params(self._next_key())
        morphed = np.asarray(apply_morph(jnp.asarray(stacked), *params))
        return [morphed[..., :c], morphed[..., c : 2 * c]], morphed[..., -1:]


def rearrange_timeseries(batch: np.ndarray, rng: np.random.Generator):
    """Randomly rotate the sequence start while preserving relative order
    (utils/processing.py:195-218 / utils/array_tools.py:225-256).
    Returns (rearranged, starttime)."""
    t = batch.shape[1]
    start = int(rng.integers(0, t))
    return np.concatenate([batch[:, start:], batch[:, :start]], axis=1), start


def split_timeseries(batch: np.ndarray, n_channels: int):
    """(B, T, H, W, C) -> features (first T-1 steps) + label (last step,
    first n_channels bands) (utils/processing.py:209-218)."""
    feats = batch[:, :-1]
    labels = batch[:, -1, :, :, :n_channels]
    return feats, labels


class LSTMChipDataset(_BaseChipDataset):
    """(T, C, H, W) npy series -> (B, T-1, H, W, C) feats + next-step label
    (LSTMDataGenerator, utils/processing.py:895-972)."""

    def __init__(
        self,
        files: Sequence[str],
        batch_size: int = 32,
        dim: Tuple[int, int] = (256, 256),
        n_channels: int = 4,
        n_timesteps: int = 6,
        divisor: float = 10000.0,
        shuffle: bool = True,
        to_fit: bool = True,
        seed: int = 0,
    ):
        self.files = files
        self.dim = dim
        self.n_channels = n_channels
        self.n_timesteps = n_timesteps
        self.divisor = divisor
        super().__init__(len(files), batch_size, shuffle, seed, to_fit)

    def _load_batch(self, idxs: np.ndarray, timesteps: int) -> np.ndarray:
        arrays = [np.asarray(load_numpy(self.files[k]), np.float32) for k in idxs]
        batch = np.stack(arrays)[:, :timesteps]  # (B, T, C, H, W)
        batch = _center_trim_hw(batch, self.dim, h_axis=3)
        batch = np.moveaxis(batch, 2, 4)  # (B, T, H, W, C)
        normalized = batch / self.divisor
        return np.where(np.isfinite(normalized), normalized, 0.0)

    def __getitem__(self, index: int):
        idxs = self._batch_indexes(index)
        normalized = self._load_batch(idxs, self.n_timesteps)
        if not self.to_fit:
            return normalized
        for _ in range(8):  # reshuffle if labels come out all-empty
            rearranged, _ = rearrange_timeseries(normalized, self._rng)
            feats, labels = split_timeseries(rearranged, self.n_channels)
            if not np.any(labels.sum(axis=(1, 2, 3)) == 0.0):
                return feats, labels
        # The reference silently yields the last draw here even when a
        # label is still all-zero (utils/processing.py:944-960) — a series
        # that is empty at EVERY rotation cannot produce a valid next-step
        # target, and training on a silent zero label corrupts the loss.
        # Fail explicitly (package doctrine: skipped batches raise or
        # filter explicitly, module docstring above).
        empty = [int(k) for k, s in
                 zip(idxs, labels.sum(axis=(1, 2, 3))) if s == 0.0]
        raise ValueError(
            "all-empty next-step labels after 8 sequence rotations for "
            f"series files {[self.files[k] for k in empty]}; drop these "
            "series (every timestep is zero) or pass to_fit=False"
        )


class LSTMAutoencoderChipDataset(LSTMChipDataset):
    """Adds harmonic inputs + reversed-sequence target + optional
    relative-error sample weights (LSTMAutoencoderGenerator,
    utils/processing.py:974-1049). Start month parsed from the filename
    stem's third '_'-part."""

    def __init__(self, *args, harmonics: bool = True, sample_weights: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.harmonics = harmonics
        self.sample_weights = sample_weights

    def __getitem__(self, index: int):
        idxs = self._batch_indexes(index)
        normalized = self._load_batch(idxs, self.n_timesteps + 1)
        starts = [int(Path(self.files[k]).stem.split("_")[2]) for k in idxs]

        if not self.to_fit:
            harmonics = (
                np.asarray(make_harmonics(np.asarray(starts), self.n_timesteps, self.dim))
                if self.harmonics
                else None
            )
            return [normalized, harmonics]

        rearranged, start = rearrange_timeseries(normalized, self._rng)
        feats, y = split_timeseries(rearranged, self.n_channels)
        temporal_y = np.flip(feats, axis=1)
        weights = None
        if self.sample_weights:
            last = feats[:, -1]
            weights = [None, np.abs(last - y) / (last + y)]
        harmonics = None
        if self.harmonics:
            shifted = [s + start - self.n_timesteps for s in starts]
            harmonics = np.asarray(
                make_harmonics(np.asarray(shifted), self.n_timesteps, self.dim)
            )
        return [feats, harmonics], [temporal_y, y], weights


class HybridChipDataset(UNetChipDataset):
    """U-Net sources + S2/S1 timeseries for the hybrid model
    (HybridDataGenerator, utils/processing.py:1051-1184)."""

    def __init__(
        self,
        sources: Dict[str, ChipSource],
        s2_series_files: Optional[Sequence[str]] = None,
        s1_series_files: Optional[Sequence[str]] = None,
        lstm_dim: Tuple[int, int, int, int] = (6, 32, 32, 6),
        **kwargs,
    ):
        super().__init__(sources, **kwargs)
        self.s2_series_files = s2_series_files
        self.s1_series_files = s1_series_files
        self.lstm_dim = lstm_dim

    def _load_series(self, files: Sequence[str], idxs: np.ndarray, maxval: float) -> np.ndarray:
        arrays = [np.asarray(load_numpy(files[k]), np.float32) for k in idxs]
        batch = np.stack(arrays)[:, : self.lstm_dim[0]]  # (B, T, C, H, W)
        batch = _center_trim_hw(batch, self.lstm_dim[1:3], h_axis=3)
        batch = np.moveaxis(batch, 2, 4)
        normalized = batch / maxval
        return np.where(np.isfinite(normalized), normalized, 0.0)

    def __getitem__(self, index: int):
        idxs = self._batch_indexes(index)
        lstm_pieces = []
        if self.s2_series_files is not None:
            s2 = self._load_series(self.s2_series_files, idxs, 10000.0)
            if self.to_fit:
                s2 = np.asarray(aug_color(self._next_key(), jnp.asarray(s2), nan_aware=True))
            lstm_pieces.append(s2)
        if self.s1_series_files is not None:
            lstm_pieces.append(self._load_series(self.s1_series_files, idxs, -50.0))
        lstm_data = np.concatenate(lstm_pieces, axis=-1)

        unet_pieces = []
        for source in self.sources.values():
            data = self._load_source(source, idxs)
            if source.color_aug and self.to_fit:
                data = np.asarray(aug_color(self._next_key(), jnp.asarray(data), nan_aware=True))
            unet_pieces.append(data)
        unet_data = np.concatenate(unet_pieces, axis=-1)

        if not self.to_fit:
            return [unet_data, lstm_data]
        labels = self._process_y(idxs)
        return [unet_data, lstm_data], labels
