"""Color and morphological augmentation under explicit JAX PRNG keys.

Reference behaviors: `aug_tensor_color` (utils/processing.py:129-152),
`aug_tensor_morph` (utils/processing.py:169-183), and the NumPy twins
`aug_array_color`/`aug_array_morph` (utils/array_tools.py:159-213).

All randomness is factored out into explicit draws (the pattern the
reference itself exposes via ``aug_array_morph(return_tuple=True)``,
utils/array_tools.py:186-213) so augmentation is reproducible, vmappable
over a batch of keys, and fully jittable — no Python-side RNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def aug_color(
    key,
    img,
    contra_adj: float = 0.05,
    bright_adj: float = 0.05,
    per_channel: bool = True,
    nan_aware: bool = False,
):
    """Random contrast/brightness recoloring: ``(x - mu)*c + mu*b``.

    ``per_channel=True`` draws one multiplier pair per channel (the TF
    flavor, utils/processing.py:129-152); ``False`` draws scalar
    multipliers shared across channels (the NumPy flavor,
    utils/array_tools.py:159-184). Channel means are taken over the two
    spatial axes (the last two before the channel axis), so this works on
    (H, W, C) and (..., H, W, C) stacks alike.
    """
    img = jnp.asarray(img)
    n_ch = img.shape[-1]
    spatial_axes = (img.ndim - 3, img.ndim - 2)
    if nan_aware:
        ch_mean = jnp.nanmean(img, axis=spatial_axes, keepdims=True)
    else:
        ch_mean = jnp.mean(img, axis=spatial_axes, keepdims=True)

    ckey, bkey = jax.random.split(key)
    shape = (n_ch,) if per_channel else ()
    contra_mul = jax.random.uniform(
        ckey, shape, minval=1.0 - contra_adj, maxval=1.0 + contra_adj, dtype=img.dtype
    )
    bright_mul = jax.random.uniform(
        bkey, shape, minval=1.0 - bright_adj, maxval=1.0 + bright_adj, dtype=img.dtype
    )
    return (img - ch_mean) * contra_mul + ch_mean * bright_mul


def rgb_to_hsv(rgb):
    """Channels-last RGB [0,1] -> HSV, matching tf.image.rgb_to_hsv."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    safe = jnp.where(delta == 0, 1.0, delta)
    s = jnp.where(maxc == 0, 0.0, delta / jnp.where(maxc == 0, 1.0, maxc))
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta == 0, 0.0, (h / 6.0) % 1.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
    """HSV -> RGB, matching tf.image.hsv_to_rgb."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def aug_color_hsv(
    key,
    img,
    max_hue_delta: float = 0.05,
    saturation_range=(0.6, 1.6),
    max_brightness_delta: float = 0.05,
    contrast_range=(0.7, 1.3),
):
    """HSV-space color augmentation for RGB imagery.

    The reference's `augColor` (utils/processing.py:154-167): random hue
    shift, saturation scale, brightness delta, contrast scale — the
    tf.image.random_* chain in the same order, as one jittable function.
    """
    img = jnp.asarray(img)
    hkey, skey, bkey, ckey = jax.random.split(key, 4)

    hsv = rgb_to_hsv(img)
    hue = (hsv[..., 0] + jax.random.uniform(
        hkey, (), minval=-max_hue_delta, maxval=max_hue_delta, dtype=img.dtype
    )) % 1.0
    sat = jnp.clip(
        hsv[..., 1]
        * jax.random.uniform(
            skey, (), minval=saturation_range[0], maxval=saturation_range[1], dtype=img.dtype
        ),
        0.0,
        1.0,
    )
    x = hsv_to_rgb(jnp.stack([hue, sat, hsv[..., 2]], axis=-1))

    x = x + jax.random.uniform(
        bkey, (), minval=-max_brightness_delta, maxval=max_brightness_delta, dtype=img.dtype
    )
    contrast = jax.random.uniform(
        ckey, (), minval=contrast_range[0], maxval=contrast_range[1], dtype=img.dtype
    )
    mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
    return (x - mean) * contrast + mean


def draw_morph_params(key):
    """Draw (flip_v, flip_h, n_rot90) exactly as the reference does.

    flip draws are Bernoulli(0.5), rotation is uniform over {0,1,2,3}
    (utils/processing.py:169-183, utils/array_tools.py:186-213).
    """
    vkey, hkey, rkey = jax.random.split(key, 3)
    flip_v = jax.random.bernoulli(vkey)
    flip_h = jax.random.bernoulli(hkey)
    n_rot = jax.random.randint(rkey, (), 0, 4)
    return flip_v, flip_h, n_rot


def apply_morph(img, flip_v, flip_h, n_rot):
    """Apply a factored morphological augmentation (jittable).

    Axis convention matches the reference: with channels last, the
    vertical axis is third-from-last and horizontal second-from-last
    (utils/array_tools.py:195-197), so the same op works on (H, W, C)
    chips and (T, H, W, C) timeseries.
    """
    img = jnp.asarray(img)
    v_axis = img.ndim - 3
    h_axis = img.ndim - 2
    x = jnp.where(flip_v, jnp.flip(img, axis=v_axis), img)
    x = jnp.where(flip_h, jnp.flip(x, axis=h_axis), x)
    # rot90 by a traced count: all four rotations have the same shape only
    # for square spatial dims, which holds for every chip pipeline here.
    rots = [x, jnp.rot90(x, 1, (v_axis, h_axis)), jnp.rot90(x, 2, (v_axis, h_axis)), jnp.rot90(x, 3, (v_axis, h_axis))]
    return jax.lax.switch(n_rot, [lambda r=r: r for r in rots])


def aug_morph(key, img, return_params: bool = False):
    """Random flip-v / flip-h / rot90 augmentation of a channels-last stack.

    The reference applies this to the concatenated [features ‖ labels]
    stack so both transform identically (utils/processing.py:387); do the
    same here, or reuse ``draw_morph_params`` + ``apply_morph`` to share
    draws across arrays of different channel depth.
    """
    flip_v, flip_h, n_rot = draw_morph_params(key)
    out = apply_morph(img, flip_v, flip_h, n_rot)
    if return_params:
        return out, (flip_v, flip_h, n_rot)
    return out
