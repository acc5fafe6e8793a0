"""Fused on-device chip preprocessing: rescale + color aug (+ morph aug).

The recolor + per-channel-moment rescale of the reference's to_tuple chain
(utils/processing.py:335-392: aug_tensor_color -> rescale_tensor) runs as
ONE Pallas kernel pass per chip: the chip is staged into VMEM once and the
channel means/extrema, ±5% contrast/brightness recolor and min/max rescale
happen on-chip instead of materializing each stage to HBM. The
morphological flip/rot90 applies around the kernel with XLA ops (Mosaic's
TC lowering has no `rev` primitive; a flip is pure data movement XLA
already handles) — callers see one jittable function either way.

Randomness is drawn OUTSIDE the kernel with jax.random (a few scalars per
chip), exactly as ops.augment draws it, so the fused path is
bit-compatible with the unfused chain (aug_color ``per_channel=True`` +
rescale_image ``axes=(0, 1)`` + apply_morph) and testable in interpreter
mode on CPU.

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

from satellite_computervision_tpu.ops.augment import apply_morph, draw_morph_params


def _recolor_rescale_kernel(bands_ref, params_ref, out_ref, *, n_color, augment):
    """One (batch, channel) grid cell: a full (K, K) channel plane in VMEM.

    Mosaic on this toolchain rejects per-channel reductions inside 4-D
    blocks (SIGABRT) and non-128-aligned trailing channel dims, but grids
    of 2-D planes lower cleanly (bisection notes: DEVNOTES.md)."""
    j = pl.program_id(1)
    v = bands_ref[0, 0]  # (K, K)
    is_color = j < n_color

    if augment:
        mean = jnp.mean(v)
        # params ride in one (8, 128) VMEM tile per chip: row 0 contrast,
        # row 1 brightness, lane = channel. A dynamic lane index cannot be
        # proven 128-aligned by Mosaic; select the lane by masked sum.
        lane = jax.lax.broadcasted_iota(jnp.int32, (128,), 0)
        contra = jnp.sum(jnp.where(lane == j, params_ref[0, 0, :], 0.0))
        bright = jnp.sum(jnp.where(lane == j, params_ref[0, 1, :], 0.0))
        v = jnp.where(is_color, (v - mean) * contra + mean * bright, v)
    # min/max of the (recolored) values, matching the unfused op order
    lo = jnp.min(v)
    hi = jnp.max(v)
    out_ref[0, 0] = jnp.where(is_color, (v - lo) / (hi - lo + 1e-8), v)


def draw_augment_params(key, batch: int, channels: int, contra_adj=0.05, bright_adj=0.05):
    """Per-chip augmentation draws, identical to the unfused path: one
    aug_color key + one morph key per sample, split exactly as
    ops.augment does."""
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
    """(B, K, K, C) chip stack -> preprocessed stack.

    The leading ``n_color`` channels are recolored + min/max rescaled per
    channel (axes (0, 1)) in one Pallas pass; all channels share the
    per-chip random flip/rot90. Pass ``augment=False`` (key optional) for
    the deterministic eval path.

    Verification status: bit-compatible with the unfused op chain in
    interpreter mode (tests/test_pallas.py) AND validated compiled on a
    v5e (round 2): compiled output matches interpret mode to 2e-7 and runs
    ~8% faster than the fused-by-XLA op chain at batch 16 x 256^2 x 8. The
    XLA path (data.pipeline.make_preprocess_fn) remains the default in the
    input pipeline because it also carries derived bands/one-hot; this
    kernel serves the engine's ``preprocess_fn`` slot. Mosaic layout rules
    this design obeys are recorded in DEVNOTES.md (Pallas section).
    """
    bands = jnp.asarray(bands, jnp.float32)
    b, k, k2, c = bands.shape
    if k != k2:
        raise ValueError("chips must be square for rot90 augmentation")
    if c > 128:
        raise ValueError("fused_preprocess supports up to 128 channels")
    if n_color is None:
        n_color = c

    if augment:
        if key is None:
            raise ValueError("augment=True requires a PRNG key")
        contra, bright, morph = draw_augment_params(key, b, c, contra_adj, bright_adj)
    else:
        contra = jnp.ones((b, c), jnp.float32)
        bright = jnp.ones((b, c), jnp.float32)
        morph = None

    # Mosaic wants (8, 128)-tiled VMEM blocks: pack the per-chip color
    # params into one tile.
    params = jnp.zeros((b, 8, 128), jnp.float32)
    params = params.at[:, 0, :c].set(contra)
    params = params.at[:, 1, :c].set(bright)

    kernel = functools.partial(
        _recolor_rescale_kernel, n_color=n_color, augment=augment
    )
    # channels-first so each grid cell owns one aligned (K, K) plane
    planes = bands.transpose(0, 3, 1, 2)
    out = pl.pallas_call(
        kernel,
        grid=(b, c),
        in_specs=[
            pl.BlockSpec((1, 1, k, k), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, k, k), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, c, k, k), jnp.float32),
        interpret=interpret,
    )(planes, params)
    out = out.transpose(0, 2, 3, 1)

    if augment:
        out = jax.vmap(apply_morph)(out, morph[:, 0] != 0, morph[:, 1] != 0, morph[:, 2])
    return out
