"""Fused on-device chip preprocessing: rescale + color aug + morph aug.

One Pallas kernel pass replaces the reference's to_tuple chain
(utils/processing.py:335-392: aug_tensor_color -> rescale_tensor ->
concat -> aug_tensor_morph), which as separate XLA ops materializes the
(B, K, K, C) stack in HBM between stages. Here each chip is staged into
VMEM once and the per-channel moments, ±5% contrast/brightness recolor,
min/max rescale, and random flip/rot90 all happen on-chip.

Randomness is drawn OUTSIDE the kernel with jax.random (a few scalars per
chip — negligible), exactly as ops.augment draws it, so the fused kernel
is bit-compatible with the unfused op chain (aug_color with
``per_channel=True`` + rescale_image ``axes=(0, 1)`` + apply_morph) and
testable in interpreter mode on CPU.

Label/one-hot channels ride in the same block: they skip color/rescale
(the trailing ``C - n_color`` channels) but share the morph transform —
the reason the reference concatenates features and labels before
augmenting (utils/processing.py:387).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _preprocess_kernel(bands_ref, contra_ref, bright_ref, morph_ref, out_ref, *, n_color, augment):
    chip = bands_ref[0]  # (K, K, C)
    c = chip.shape[2]

    color_mask = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c), 2) < n_color

    x = chip
    if augment:
        mean = jnp.mean(chip, axis=(0, 1))
        contra = contra_ref[0]  # (C,)
        bright = bright_ref[0]
        recolored = (x - mean) * contra + mean * bright
        x = jnp.where(color_mask, recolored, x)
    # min/max of the (recolored) values, matching the unfused op order
    lo = jnp.min(x, axis=(0, 1))
    hi = jnp.max(x, axis=(0, 1))
    rescaled = (x - lo) / (hi - lo + 1e-8)
    x = jnp.where(color_mask, rescaled, x)

    if augment:
        flip_v = morph_ref[0, 0] != 0
        flip_h = morph_ref[0, 1] != 0
        rot = morph_ref[0, 2]
        x = jnp.where(flip_v, jnp.flip(x, axis=0), x)
        x = jnp.where(flip_h, jnp.flip(x, axis=1), x)
        rots = [
            x,
            jnp.flip(jnp.swapaxes(x, 0, 1), axis=0),   # rot90 k=1
            jnp.flip(jnp.flip(x, axis=0), axis=1),     # k=2
            jnp.flip(jnp.swapaxes(x, 0, 1), axis=1),   # k=3
        ]
        x = jax.lax.switch(rot, [lambda r=r: r for r in rots])

    out_ref[0] = x


def draw_augment_params(key, batch: int, channels: int, contra_adj=0.05, bright_adj=0.05):
    """Per-chip augmentation draws, identical to the unfused path: one
    aug_color key + one morph key per sample, split exactly as
    ops.augment does."""
    from satellite_computervision_tpu.ops.augment import draw_morph_params

    keys = jax.random.split(key, batch * 2).reshape(batch, 2)

    def one(k2):
        ckey, bkey = jax.random.split(k2[0])
        contra = jax.random.uniform(
            ckey, (channels,), minval=1 - contra_adj, maxval=1 + contra_adj
        )
        bright = jax.random.uniform(
            bkey, (channels,), minval=1 - bright_adj, maxval=1 + bright_adj
        )
        fv, fh, rot = draw_morph_params(k2[1])
        morph = jnp.stack([fv.astype(jnp.int32), fh.astype(jnp.int32), rot])
        return contra, bright, morph

    return jax.vmap(one)(keys)


def fused_preprocess(
    bands,
    key=None,
    n_color: int = None,
    contra_adj: float = 0.05,
    bright_adj: float = 0.05,
    augment: bool = True,
    interpret: bool = False,
):
    """(B, K, K, C) chip stack -> preprocessed stack in one kernel pass.

    The leading ``n_color`` channels are recolored + min/max rescaled per
    channel (axes (0, 1)); all channels share the flip/rot90 draw. Pass
    ``augment=False`` (key optional) for the deterministic eval path.
    """
    bands = jnp.asarray(bands, jnp.float32)
    b, k, k2, c = bands.shape
    if k != k2:
        raise ValueError("chips must be square for rot90 augmentation")
    if n_color is None:
        n_color = c

    if augment:
        if key is None:
            raise ValueError("augment=True requires a PRNG key")
        contra, bright, morph = draw_augment_params(key, b, c, contra_adj, bright_adj)
    else:
        contra = jnp.ones((b, c), jnp.float32)
        bright = jnp.ones((b, c), jnp.float32)
        morph = jnp.zeros((b, 3), jnp.int32)

    kernel = functools.partial(_preprocess_kernel, n_color=n_color, augment=augment)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k, k, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (i, 0)),
            pl.BlockSpec((1, 3), lambda i: (i, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, k, k, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, k, k, c), jnp.float32),
        interpret=interpret,
    )(bands, contra, bright, morph)
