"""Sentinel-2 / Landsat cloud, water and shadow masking math as jittable JAX.

The reference expresses these per-pixel ops as lazy Earth Engine images
(utils/ee_tools.py:9-306) executed on Google's servers. Here the same math
runs on-device over raw band arrays — so masking/compositing can fuse into
the TPU preprocessing path when imagery arrives as arrays (e.g. the
Planetary Computer route), while ``cloud.ee`` keeps thin server-side
builders for the EE route.

Band arrays are dicts of (..., H, W) reflectance arrays keyed by Sentinel
band names; QA/SCL are integer arrays.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp

# Sentinel-2 L1C digital numbers -> TOA reflectance (utils/ee_tools.py:90-108)
TOA_BANDS = ("B1", "B2", "B3", "B4", "B5", "B6", "B7", "B8", "B8A", "B9", "B10", "B11", "B12")


def sentinel2toa(bands: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """DN / 10000 for every reflectance band; QA60 passes through."""
    out = dict(bands)
    for name in TOA_BANDS:
        if name in out:
            out[name] = jnp.asarray(out[name], jnp.float32) / 10000.0
    return out


def rescale(x, thresholds):
    """Linear stretch so thresholds map to [0, 1] (utils/ee_tools.py:110-113);
    inverted thresholds flip the sense, exactly as the EE expression does."""
    lo, hi = thresholds
    return (jnp.asarray(x, jnp.float32) - lo) / (hi - lo)


def normalized_difference(a, b):
    return (a - b) / (a + b)


def norm_p(z):
    """Logistic approximation to the standard-normal CDF p-value
    (utils/ee_tools.py:9-20)."""
    z = jnp.asarray(z, jnp.float32)
    return 1.0 - 1.0 / (1.0 + jnp.exp(-1.65451 * z))


def gamma_p(stat, df):
    """Gamma(1, df) CDF (utils/ee_tools.py:31-37)."""
    from jax.scipy.special import gammainc

    return gammainc(1.0, jnp.asarray(stat, jnp.float32) / df)


def chi_p(chi, df):
    """Chi-square CDF probability (utils/ee_tools.py:21-29)."""
    from jax.scipy.special import gammainc

    return gammainc(df / 2.0, jnp.asarray(chi, jnp.float32) / 2.0)


def normalize_minmax(img, max_img, min_img):
    """(img - min) / (max - min) (utils/ee_tools.py:39-50)."""
    return (img - min_img) / (max_img - min_img)


def standardize(img, axes=(-2, -1)):
    """Per-band z-scores (utils/ee_tools.py:52-70, reduceRegion -> spatial
    moments)."""
    img = jnp.asarray(img, jnp.float32)
    mean = jnp.mean(img, axis=axes, keepdims=True)
    sd = jnp.std(img, axis=axes, keepdims=True)
    return (img - mean) / sd


def lda_score(bands: Dict[str, jnp.ndarray], intercept: float, names: Sequence[str], coefficients: Sequence[float]):
    """Linear-discriminant band combination (utils/ee_tools.py:73-88)."""
    acc = jnp.asarray(intercept, jnp.float32)
    for name, coeff in zip(names, coefficients):
        acc = acc + jnp.asarray(bands[name], jnp.float32) * coeff
    return acc


def basic_qa_mask(qa60) -> jnp.ndarray:
    """True where clear: QA60 bits 10 (cloud) and 11 (cirrus) both unset
    (utils/ee_tools.py:159-180)."""
    qa = jnp.asarray(qa60, jnp.int32)
    return ((qa & 1024) == 0) & ((qa & 2048) == 0)


def landsat8_sr_mask(pixel_qa) -> jnp.ndarray:
    """True where clear: bits 3 (shadow) and 5 (cloud) unset
    (utils/ee_tools.py:183-195)."""
    qa = jnp.asarray(pixel_qa, jnp.int32)
    return ((qa & 8) == 0) & ((qa & 32) == 0)


def cloud_bands(bands: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Derived cloud-indicator bands ndmi/ndsi/cirrus/vis
    (utils/ee_tools.py:198-204)."""
    out = dict(bands)
    out["ndmi"] = normalized_difference(bands["B8"], bands["B11"])
    out["ndsi"] = normalized_difference(bands["B3"], bands["B11"])
    out["cirrus"] = bands["B1"] + bands["B10"]
    out["vis"] = bands["B4"] + bands["B3"] + bands["B2"]
    return out


def dark_channels(r, g, b) -> Dict[str, jnp.ndarray]:
    """Dark-channel chromaticity angles C1/C2/C3 (utils/ee_tools.py:206-216)."""
    return {
        "C1": jnp.arctan(g / jnp.maximum(r, b)),
        "C2": jnp.arctan(r / jnp.maximum(g, b)),
        "C3": jnp.arctan(b / jnp.maximum(r, g)),
    }


def sentinel_cloud_score(bands: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Custom cloud likelihood in [0, 100] (utils/ee_tools.py:218-255).

    Takes raw DN bands (TOA conversion applied internally); min over
    brightness/moisture/snow indicators, scaled x100 and floored to byte.
    """
    toa = sentinel2toa(bands)
    score = jnp.ones_like(jnp.asarray(toa["B2"], jnp.float32))
    score = jnp.minimum(score, rescale(toa["B2"], (0.1, 0.5)))
    score = jnp.minimum(score, rescale(toa["B1"], (0.1, 0.3)))
    score = jnp.minimum(score, rescale(toa["B1"] + toa["B10"], (0.15, 0.2)))
    score = jnp.minimum(score, rescale(toa["B4"] + toa["B3"] + toa["B2"], (0.2, 0.8)))
    ndmi = normalized_difference(toa["B8"], toa["B11"])
    score = jnp.minimum(score, rescale(ndmi, (-0.1, 0.1)))
    ndsi = normalized_difference(toa["B3"], toa["B11"])
    score = jnp.minimum(score, rescale(ndsi, (0.8, 0.6)))
    return jnp.floor(score * 100.0).astype(jnp.uint8)


def water_score(bands: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Water likelihood in [0, 1] (utils/ee_tools.py:115-157)."""
    toa = sentinel2toa(bands)
    score = jnp.ones_like(jnp.asarray(toa["B2"], jnp.float32))
    shadow_sum = toa["B8"] + toa["B11"] + toa["B12"]
    score = jnp.minimum(score, jnp.clip(rescale(shadow_sum, (0.35, 0.2)), 0.0, 1.0))
    dark = jnp.stack([toa[b] for b in ("B3", "B4", "B8", "B11", "B12")])
    mean = jnp.mean(dark, axis=0)
    std = jnp.std(dark, axis=0)
    z = (toa["B2"] - std) / mean
    score = jnp.minimum(score, jnp.clip(rescale(z, (0.0, 1.0)), 0.0, 1.0))
    ndsi = normalized_difference(toa["B3"], toa["B11"])
    score = jnp.minimum(score, rescale(ndsi, (0.3, 0.8)))
    return jnp.clip(score, 0.0, 1.0)


def scl_mask(scl) -> jnp.ndarray:
    """True where usable, from the L2A scene-classification band: not cloud
    (8, 9), cirrus (10), snow (11), dark/shadow (2, 3)
    (utils/ee_tools.py:270-306)."""
    scl = jnp.asarray(scl, jnp.int32)
    bad = (scl == 8) | (scl == 9) | (scl == 10) | (scl == 11) | (scl == 2) | (scl == 3)
    return ~bad


def toa_mask(bands: Dict[str, jnp.ndarray], cloud_thresh: int = 15) -> jnp.ndarray:
    """L1C mask: QA60 clear AND cloudScore <= thresh
    (maskTOA, utils/ee_tools.py:289-306)."""
    return basic_qa_mask(bands["QA60"]) & (sentinel_cloud_score(bands) <= cloud_thresh)


def combined_mask(bands: Dict[str, jnp.ndarray], cdi=None, jrc_water=None,
                  cloud_thresh: int = 15, water_thresh: float = 0.25,
                  shadow_b11: float = 900.0) -> jnp.ndarray:
    """Combined cloud/water/shadow keep-mask (``mask``,
    utils/ee_tools.py:257-268). True where a pixel survives all three:

    - clouds: cloudScore <= ``cloud_thresh``, OR-overridden by a
      Sentinel-2 CDI plane >= -0.2 when one is supplied (CDI is an EE
      server-side algorithm — here an optional precomputed input);
    - water: waterScore <= ``water_thresh``; AND, when a JRC
      surface-water plane is supplied, JRC != 2 (pass it pre-dilated —
      the reference applies a 1-px focal_max first);
    - shadow: raw-DN B11 > ``shadow_b11``.

    The reference applies basicQA before scoring; compose with
    :func:`basic_qa_mask` / :func:`apply_mask` for that full pipeline.
    """
    clouds = sentinel_cloud_score(bands) <= cloud_thresh
    if cdi is not None:
        clouds = clouds | (jnp.asarray(cdi) >= -0.2)
    water = water_score(bands) <= water_thresh
    if jrc_water is not None:
        water = water & (jnp.asarray(jrc_water) != 2)
    shadow = jnp.asarray(bands["B11"]) > shadow_b11
    return clouds & water & shadow


def apply_mask(bands: Dict[str, jnp.ndarray], mask: jnp.ndarray, fill=jnp.nan):
    """updateMask equivalent: masked-out pixels become ``fill`` (NaN, the
    nodata convention the npy generators consume,
    utils/processing.py:553-584)."""
    return {
        k: jnp.where(mask, jnp.asarray(v, jnp.float32), fill) for k, v in bands.items()
    }
