"""Golden tests for normalize/rescale against independent NumPy math.

The expected values re-derive the reference contract
(utils/processing.py:225-322, utils/array_tools.py:47-157) directly in
NumPy, so any divergence in the JAX implementation fails loudly.
"""

import numpy as np
import pytest

from satellite_computervision_tpu.ops import (
    normalize_image,
    rescale_image,
    normalize_timeseries,
)


def _np_normalize(x, axes, eps=1e-8):
    mean = x.mean(axis=axes, keepdims=True)
    var = x.var(axis=axes, keepdims=True)
    return (x - mean) / np.sqrt(var + eps)


@pytest.mark.parametrize("axes", [(2,), (0, 1), (0, 1, 2)])
def test_normalize_axes(rng, axes):
    x = rng.normal(100.0, 25.0, (16, 16, 4)).astype(np.float32)
    got = np.asarray(normalize_image(x, axes=axes))
    np.testing.assert_allclose(got, _np_normalize(x, axes), rtol=1e-5, atol=1e-5)


def test_normalize_moments(rng):
    x = rng.normal(0.0, 1.0, (8, 8, 3)).astype(np.float32)
    moments = [(1.0, 4.0), (2.0, 9.0), (0.0, 1.0)]
    got = np.asarray(normalize_image(x, moments=moments))
    mean = np.array([1.0, 2.0, 0.0], np.float32)
    var = np.array([4.0, 9.0, 1.0], np.float32)
    np.testing.assert_allclose(got, (x - mean) / np.sqrt(var + 1e-8), rtol=1e-5)


def test_normalize_splits_passthrough(rng):
    """Channels beyond sum(splits) pass through unchanged
    (utils/processing.py:268-277)."""
    x = rng.normal(5.0, 2.0, (8, 8, 6)).astype(np.float32)
    got = np.asarray(normalize_image(x, axes=(0, 1), splits=[2, 2]))
    np.testing.assert_allclose(got[..., :2], _np_normalize(x[..., :2], (0, 1)), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got[..., 2:4], _np_normalize(x[..., 2:4], (0, 1)), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(got[..., 4:], x[..., 4:])


def test_normalize_splits_with_moments(rng):
    """Explicit moments split into per-group slices when covering all
    grouped channels."""
    x = rng.normal(0.0, 1.0, (4, 4, 4)).astype(np.float32)
    moments = [(0.0, 1.0), (1.0, 4.0), (2.0, 9.0), (3.0, 16.0)]
    got = np.asarray(normalize_image(x, moments=moments, splits=[2, 2]))
    mean = np.array([0.0, 1.0, 2.0, 3.0], np.float32)
    var = np.array([1.0, 4.0, 9.0, 16.0], np.float32)
    np.testing.assert_allclose(got, (x - mean) / np.sqrt(var + 1e-8), rtol=1e-5)


def test_normalize_nan_aware_std_form(rng):
    """NumPy-twin flavor: nanmean/nanstd and (std + eps) denominator
    (utils/array_tools.py:84-95)."""
    x = rng.normal(10.0, 3.0, (8, 8, 2)).astype(np.float32)
    x[0, 0, 0] = np.nan
    got = np.asarray(normalize_image(x, axes=(0, 1), nan_aware=True, std_form=True))
    mean = np.nanmean(x, axis=(0, 1), keepdims=True)
    std = np.nanstd(x, axis=(0, 1), keepdims=True)
    np.testing.assert_allclose(got, (x - mean) / (std + 1e-8), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("axes", [(2,), (0, 1)])
def test_rescale(rng, axes):
    x = rng.uniform(0.0, 10000.0, (16, 16, 4)).astype(np.float32)
    got = np.asarray(rescale_image(x, axes=axes))
    lo = x.min(axis=axes, keepdims=True)
    hi = x.max(axis=axes, keepdims=True)
    np.testing.assert_allclose(got, (x - lo) / (hi - lo + 1e-8), rtol=1e-5, atol=1e-6)


def test_rescale_moments_matches_divisor_convention(rng):
    x = rng.uniform(0.0, 255.0, (4, 4, 3)).astype(np.float32)
    got = np.asarray(rescale_image(x, moments=[(0.0, 255.0)] * 3))
    np.testing.assert_allclose(got, x / (255.0 + 1e-8), rtol=1e-5)


def test_rescale_splits_must_cover():
    x = np.zeros((4, 4, 5), np.float32)
    with pytest.raises(ValueError):
        rescale_image(x, splits=[2, 2])


def test_rescale_splits(rng):
    x = rng.uniform(0.0, 1.0, (8, 8, 4)).astype(np.float32)
    got = np.asarray(rescale_image(x, axes=(0, 1), splits=[3, 1]))
    for sl in (slice(0, 3), slice(3, 4)):
        sub = x[..., sl]
        lo = sub.min(axis=(0, 1), keepdims=True)
        hi = sub.max(axis=(0, 1), keepdims=True)
        np.testing.assert_allclose(got[..., sl], (sub - lo) / (hi - lo + 1e-8), rtol=1e-5, atol=1e-6)


def test_normalize_timeseries_nan_fill():
    arr = np.array([[0.0, 5000.0], [np.nan, 10000.0]], np.float32)
    got = np.asarray(normalize_timeseries(arr))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got[0, 1], 5000.0 / (10000.0 + 1e-5), rtol=1e-6)
    assert got[1, 0] == 0.0
