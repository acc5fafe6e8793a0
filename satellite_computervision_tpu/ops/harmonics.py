"""Harmonic (sin/cos of time) encodings for timeseries models.

Reference: `sin_cos` (utils/array_tools.py:283-286), `make_harmonics`
(utils/array_tools.py:12-24), `add_harmonic` (utils/array_tools.py:288-298).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def sin_cos(t, freq: int = 6):
    """(sin, cos) of ``2*pi*t/freq`` — utils/array_tools.py:283-286."""
    theta = 2.0 * math.pi * (jnp.asarray(t, jnp.float32) / freq)
    return jnp.sin(theta), jnp.cos(theta)


def make_harmonics(times, timesteps: int, dims):
    """Broadcast per-sample (sin, cos) encodings to (B, H, W, 2).

    ``times`` is a 1-D array of start times; ``timesteps`` the annual
    frequency; ``dims`` the (H, W) spatial shape
    (utils/array_tools.py:12-24).
    """
    s, c = sin_cos(jnp.asarray(times, jnp.float32), timesteps)
    sc = jnp.stack([s, c], axis=-1)  # (B, 2)
    return jnp.broadcast_to(sc[:, None, None, :], (sc.shape[0],) + tuple(dims) + (2,))


def add_harmonic(timeseries):
    """Append per-timestep sin/cos channels to a (B, T, H, W, C) series.

    Assumes the first image is the start of year, frequency = T
    (utils/array_tools.py:288-298).
    """
    timeseries = jnp.asarray(timeseries)
    b, t, h, w, _ = timeseries.shape
    s, c = sin_cos(jnp.arange(t, dtype=jnp.float32), t)
    sc = jnp.stack([s, c], axis=-1)  # (T, 2)
    harmonics = jnp.broadcast_to(sc[None, :, None, None, :], (b, t, h, w, 2))
    return jnp.concatenate([timeseries, harmonics.astype(timeseries.dtype)], axis=-1)
