"""Pallas stitch-accumulate: one-pass hann-blend canvas assembly.

The engine's overlap-tile blend (inference/tiles.py, replacing the
reference's host-side per-chip ``+=`` template loop,
utils/prediction_tools.py:133-156) stitches hann-weighted chips on a
stride-``kernel`` grid where every output pixel sums up to 4 overlapping
chips. The XLA formulation does this as 4 canvas-sized pad+adds plus a
normalizing multiply (~5 full passes over the canvas in HBM). This kernel
does it in ONE pass:

- chips are hann-weighted and zero-padded to (2k, 2k) blocks in XLA
  (cheap, fused elementwise), laid out channels-first;
- the grid walks output (k, k) canvas blocks; each grid cell DMAs exactly
  the four chip *quadrants* that land on it — quadrant (a, b) of chip
  (R-a, C-b) — via dynamic block index maps (edge cells clamp the chip
  index and mask the contribution to zero);
- the constant inverse-weight block (the hann weight sum is
  input-independent and separable) rides in as a fifth input, so
  normalization fuses into the same pass.

Every chip quadrant is read exactly once and the canvas written exactly
once: ~3 canvas-equivalents of HBM traffic instead of ~9. Block trailing
dims are (k, k) with k a multiple of 128 in production (256/512), which
satisfies Mosaic's 128-aligned-trailing-dim rule (DEVNOTES.md); interpret
mode covers arbitrary k on CPU for tests.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def hann_window_1d(side: int) -> np.ndarray:
    """The engine's 1-D hann edge profile (float32, clipped away from 0).

    Single source of truth: the 2-D chip weight is the outer product of
    this (inference/tiles.py multiplies it in) and the blend normalizer
    below divides it back out — both must come from here or hann output
    is silently mis-scaled."""
    n1 = np.arange(side, dtype=np.float32)
    return np.sqrt(
        np.clip(0.5 - 0.5 * np.cos(2.0 * np.pi * (n1 + 0.5) / side), 1e-4, None)
    ).astype(np.float32)


def hann_inverse_weights(rows: int, cols: int, kernel: int, side: int) -> np.ndarray:
    """Constant 1/sum-of-hann-weights canvas ((rows+1)*k, (cols+1)*k).

    Separable: every chip window is the same ``w1 (x) w1`` outer product
    placed on the stride-``kernel`` grid, so the weight sum factorizes
    into per-axis sums."""
    w1 = hann_window_1d(side)
    wy = np.zeros((rows + 1) * kernel, np.float32)
    for r in range(rows):
        wy[r * kernel : r * kernel + side] += w1
    wx = np.zeros((cols + 1) * kernel, np.float32)
    for c in range(cols):
        wx[c * kernel : c * kernel + side] += w1
    return 1.0 / np.maximum(wy[:, None] * wx[None, :], 1e-8)


def _stitch_kernel(q00, q01, q10, q11, invw, out, *, rows, cols):
    """One (channel, R, C) grid cell = one (k, k) canvas block.

    ``q_ab`` holds quadrant (a, b) of chip (R-a, C-b); the index map
    clamps out-of-range chip indices, so edge cells mask the stale block
    to zero here."""
    R = pl.program_id(1)
    C = pl.program_id(2)
    acc = invw[:] * 0.0
    for (a, b), ref in (((0, 0), q00), ((0, 1), q01), ((1, 0), q10), ((1, 1), q11)):
        valid = (R >= a) & (R - a < rows) & (C >= b) & (C - b < cols)
        acc = acc + jnp.where(valid, ref[0, 0, 0], 0.0)
    out[0] = acc * invw[:]


def hann_stitch(
    weighted,
    kernel: int,
    rows: int,
    cols: int,
    interpret: bool = False,
):
    """Assemble hann-weighted chips into the normalized blended canvas.

    ``weighted``: (rows*cols, side, side, c_out) hann-weighted chip
    predictions on the stride-``kernel`` grid (chip (r, c) at canvas
    (r*k, c*k)). Returns (canvas_h, canvas_w, c_out) float32 with
    canvas_h = (rows+1)*k — the same canvas inference/tiles.py's XLA
    blend produces before the output slice.
    """
    n, side, side2, c_out = weighted.shape
    if side != side2 or n != rows * cols:
        raise ValueError("weighted must be (rows*cols, side, side, c_out)")
    if side > 2 * kernel:
        raise ValueError("hann stitching requires side <= 2*kernel")
    k = kernel
    canvas_h, canvas_w = (rows + 1) * k, (cols + 1) * k

    # channels-first (2k, 2k) chip blocks: quadrant (a, b) is block
    # (a, b) of the trailing dims in k-units
    blocks = (
        weighted.astype(jnp.float32)
        .transpose(3, 0, 1, 2)
        .reshape(c_out, rows, cols, side, side)
    )
    blocks = jnp.pad(
        blocks, ((0, 0), (0, 0), (0, 0), (0, 2 * k - side), (0, 2 * k - side))
    )
    invw = jnp.asarray(hann_inverse_weights(rows, cols, k, side))

    def quad_spec(a, b):
        return pl.BlockSpec(
            (1, 1, 1, k, k),
            lambda ch, R, C, a=a, b=b: (
                ch,
                jnp.clip(R - a, 0, rows - 1),
                jnp.clip(C - b, 0, cols - 1),
                a,
                b,
            ),
        )

    out = pl.pallas_call(
        functools.partial(_stitch_kernel, rows=rows, cols=cols),
        grid=(c_out, rows + 1, cols + 1),
        in_specs=[
            quad_spec(0, 0),
            quad_spec(0, 1),
            quad_spec(1, 0),
            quad_spec(1, 1),
            pl.BlockSpec((k, k), lambda ch, R, C: (R, C)),
        ],
        out_specs=pl.BlockSpec((1, k, k), lambda ch, R, C: (ch, R, C)),
        out_shape=jax.ShapeDtypeStruct((c_out, canvas_h, canvas_w), jnp.float32),
        interpret=interpret,
    )(blocks, blocks, blocks, blocks, invw)
    return out.transpose(1, 2, 0)
