"""Per-patch normalization and rescaling.

Reproduces the axes/moments/splits contract of the reference
(`normalize_tensor`/`rescale_tensor`, utils/processing.py:225-322;
NumPy twins `normalize_array`/`rescale_array`, utils/array_tools.py:47-157)
as pure jittable JAX functions operating on channels-last images.

Contract:
- ``axes``: axes over which moments are computed (keepdims). For an (H, W, C)
  image: ``(2,)`` standardizes each pixel across channels, ``(0, 1)`` each
  channel, ``(0, 1, 2)`` globally.
- ``moments``: explicit list of per-channel tuples overriding computed
  moments, broadcast along the channel (last) axis. Convention follows the
  flavor: ``(mean, variance)`` in the TF form (``std_form=False``),
  ``(mean, std)`` in the NumPy-twin form (``std_form=True``,
  utils/array_tools.py:75-95); ``(min, max)`` for rescale.
- ``splits``: sizes of contiguous channel groups normalized independently.
  For :func:`normalize_image` the channels beyond ``sum(splits)`` pass
  through untouched (reference utils/processing.py:268-277). For
  :func:`rescale_image` splits must cover all channels (tf.split semantics,
  utils/processing.py:312-317). NOTE: the reference NumPy twin passes the
  sizes list straight to ``np.split`` where it means *indices* — a latent
  bug (utils/array_tools.py:97); we implement the intended size semantics.
- ``nan_aware``: use NaN-ignoring moments, matching the NumPy twins'
  ``np.nanmean``/``np.nanstd``. Note the TF flavor divides by
  ``sqrt(var + eps)`` while the NumPy twin divides by ``std + eps``
  (utils/array_tools.py:95); ``std_form`` selects the denominator form.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def _moments_arrays(moments, dtype):
    first = jnp.asarray([m[0] for m in moments], dtype=dtype)
    second = jnp.asarray([m[1] for m in moments], dtype=dtype)
    return first, second


def _split_moments(moments, splits):
    """Partition an explicit per-channel moments list by group sizes."""
    if moments is None:
        return [None] * len(splits)
    if len(moments) == sum(splits):
        out, start = [], 0
        for s in splits:
            out.append(moments[start : start + s])
            start += s
        return out
    # A single group's worth (or scalar pair) applied to every split.
    return [moments] * len(splits)


def _normalize_one(x, axes, epsilon, moments, nan_aware, std_form):
    if moments is not None:
        # Explicit moments follow the flavor's own convention: the TF form
        # takes (mean, variance) (utils/processing.py:246-254) while the
        # NumPy twin takes (mean, std) and divides by std + eps
        # (utils/array_tools.py:75-95).
        mean, second = _moments_arrays(moments, x.dtype)
        if std_form:
            return (x - mean) / (second + epsilon)
        return (x - mean) / jnp.sqrt(second + epsilon)
    if nan_aware:
        mean = jnp.nanmean(x, axis=axes, keepdims=True)
        var = jnp.nanvar(x, axis=axes, keepdims=True)
    else:
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
    if std_form:
        return (x - mean) / (jnp.sqrt(var) + epsilon)
    return (x - mean) / jnp.sqrt(var + epsilon)


def normalize_image(
    x,
    axes: Sequence[int] = (2,),
    epsilon: float = 1e-8,
    moments=None,
    splits=None,
    nan_aware: bool = False,
    std_form: bool = False,
):
    """Z-score an image by moments computed along ``axes`` (channels last).

    Mirrors reference utils/processing.py:225-279 (TF) and
    utils/array_tools.py:47-107 (NumPy, ``nan_aware=True, std_form=True``).
    """
    x = jnp.asarray(x)
    axes = tuple(axes)
    if splits:
        split_len = sum(splits)
        groups = []
        start = 0
        for group_moments, size in zip(_split_moments(moments, splits), splits):
            groups.append(
                _normalize_one(
                    x[..., start : start + size],
                    axes,
                    epsilon,
                    group_moments,
                    nan_aware,
                    std_form,
                )
            )
            start += size
        groups.append(x[..., split_len:])
        return jnp.concatenate(groups, axis=-1)
    return _normalize_one(x, axes, epsilon, moments, nan_aware, std_form)


def _rescale_one(x, axes, epsilon, moments, nan_aware):
    if moments is not None:
        lo, hi = _moments_arrays(moments, x.dtype)
    elif nan_aware:
        lo = jnp.nanmin(x, axis=axes, keepdims=True)
        hi = jnp.nanmax(x, axis=axes, keepdims=True)
    else:
        lo = jnp.min(x, axis=axes, keepdims=True)
        hi = jnp.max(x, axis=axes, keepdims=True)
    return (x - lo) / ((hi - lo) + epsilon)


def rescale_image(
    x,
    axes: Sequence[int] = (2,),
    epsilon: float = 1e-8,
    moments=None,
    splits=None,
    nan_aware: bool = False,
):
    """Min/max-rescale an image to [0, 1] along ``axes`` (channels last).

    Mirrors reference utils/processing.py:281-322 (TF) and
    utils/array_tools.py:109-157 (NumPy, ``nan_aware=True``). With
    ``splits``, group sizes must cover every channel (tf.split semantics).
    """
    x = jnp.asarray(x)
    axes = tuple(axes)
    if splits:
        if sum(splits) != x.shape[-1]:
            raise ValueError(
                f"rescale splits {splits} must sum to channel count {x.shape[-1]}"
            )
        groups = []
        start = 0
        for group_moments, size in zip(_split_moments(moments, splits), splits):
            groups.append(
                _rescale_one(
                    x[..., start : start + size], axes, epsilon, group_moments, nan_aware
                )
            )
            start += size
        return jnp.concatenate(groups, axis=-1)
    return _rescale_one(x, axes, epsilon, moments, nan_aware)


def normalize_timeseries(arr, maxval: float = 10000.0, minval: float = 0.0, e: float = 1e-5):
    """Scale a timeseries into [0, 1] and zero-fill NaNs.

    Mirrors reference utils/array_tools.py:215-223 (and the maxval-only
    variant at utils/processing.py:185-193).
    """
    arr = jnp.asarray(arr)
    normalized = (arr - minval) / (maxval - minval + e)
    return jnp.where(jnp.isnan(normalized), 0.0, normalized)
