"""Categorical label reclassification and one-hot encoding.

Reference: `merge_classes` (utils/array_tools.py:26-44), one-hot response
handling in `to_tuple` (utils/processing.py:358-365) and the generator
label path (utils/processing.py:652-697).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def merge_classes(cond_array, trans, out_array=None):
    """Reclassify values: where ``cond_array == src`` write ``dst``.

    ``trans`` is a sequence of (src, dst) pairs applied in order to a copy
    of ``out_array`` (defaults to ``cond_array`` itself), matching
    reference utils/array_tools.py:26-44. Later pairs win on overlap,
    including chains: with [(1, 2), (2, 3)] a 1 first becomes 2 via the
    condition array (which is never mutated) — only cells whose *original*
    value matches fire, same as the reference.
    """
    cond_array = jnp.asarray(cond_array)
    output = jnp.asarray(cond_array if out_array is None else out_array)
    for src, dst in trans:
        output = jnp.where(cond_array == src, jnp.asarray(dst, output.dtype), output)
    return output


def one_hot(labels, depth: int, axis: int = -1, dtype=jnp.float32):
    """One-hot encode integer labels along ``axis``.

    Matches the reference's ``tf.one_hot(tf.cast(x, uint8), depth)`` used
    for responses and categorical feature bands (utils/processing.py:
    360-372): inputs are cast to integers first, out-of-range values
    produce all-zero rows.
    """
    labels = jnp.asarray(labels)
    if jnp.issubdtype(labels.dtype, jnp.floating):
        labels = labels.astype(jnp.int32)
    return jax.nn.one_hot(labels, depth, axis=axis, dtype=dtype)
