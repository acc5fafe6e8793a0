"""Derived spectral bands.

Reference: `calc_ndvi` (utils/processing.py:116-127).
"""

from __future__ import annotations

import jax.numpy as jnp


def calc_ndvi(nir, red, epsilon: float = 1e-8):
    """NDVI = (NIR - RED) / (NIR + RED + eps) — utils/processing.py:116-127.

    Takes the raw band arrays (the reference takes a dict keyed 'B8'/'B4';
    band selection lives in the dataset layer here).
    """
    nir = jnp.asarray(nir)
    red = jnp.asarray(red)
    return (nir - red) / (epsilon + nir + red)
