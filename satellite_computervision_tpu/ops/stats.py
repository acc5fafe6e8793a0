"""Probability-density helpers.

Reference: utils/stats.py:4-48 (scipy-based; its ``lognormal_pdf``
references an undefined ``pi`` — a latent bug fixed here). Implemented in
JAX so they can run on-device inside masking/compositing pipelines.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax.scipy.special import gammaln


def gamma_pdf(x, shape, scale):
    """Gamma(shape, scale) density (utils/stats.py:4-23)."""
    x = jnp.asarray(x, jnp.float32)
    shape = jnp.asarray(shape, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    log_pdf = (
        (shape - 1.0) * jnp.log(x)
        - x / scale
        - gammaln(shape)
        - shape * jnp.log(scale)
    )
    return jnp.where(x > 0, jnp.exp(log_pdf), 0.0)


def lognormal_pdf(x, mean, sd):
    """Log-normal density with log-space mean/sd (utils/stats.py:25-48)."""
    x = jnp.asarray(x, jnp.float32)
    mean = jnp.asarray(mean, jnp.float32)
    sd = jnp.asarray(sd, jnp.float32)
    coeff = 1.0 / (x * sd * math.sqrt(2.0 * math.pi))
    expo = -jnp.square(jnp.log(x) - mean) / (2.0 * jnp.square(sd))
    return jnp.where(x > 0, coeff * jnp.exp(expo), 0.0)
