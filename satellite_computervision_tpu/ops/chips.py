"""Overlap-tile chip indexing, extraction and stitch-accumulation.

Reference: `generate_chip_indices`/`extract_chips`/`predict_chips`
(utils/prediction_tools.py:87-156) and the (H, W) variant
(utils/raster_tools.py:23-46). The reference's hot loop runs one
batch-1 ``model.predict`` per chip with host round-trips; here the same
geometry is expressed as jittable gather/scatter so the whole
extract -> predict -> crop -> stitch cycle stays device-resident (see
satellite_computervision_tpu.inference.tiles for the engine built on it).

Geometry (identical to the reference): a chip has side ``kernel + buffer``
and is read with its upper-left corner at ``(y - buffer//2, x - buffer//2)``;
only the central ``kernel x kernel`` window (upper-left at ``(y, x)``) is
written to the output. Chip centers tile the scene on a stride-``kernel``
grid, so in `mode="reference"` central windows are disjoint and the
reference's ``+=`` accumulation is equivalent to assignment.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def generate_chip_indices(
    height: int,
    width: int,
    kernel: int = 256,
    buffer: int = 128,
    mode: str = "reference",
) -> np.ndarray:
    """(N, 2) array of (y, x) central-window upper-left corners.

    ``mode="reference"`` reproduces utils/prediction_tools.py:87-109
    exactly: ``range(buffer//2, dim - (kernel + buffer), kernel)`` — note
    this under-covers the right/bottom margins of the scene (the reference
    simply drops them). ``mode="cover"`` additionally clamps a final
    row/column of chips so the kernel grid covers every pixel that has the
    full halo available, and is the default used by the inference engine.

    Host-side (NumPy): the index table is static metadata for a given
    scene shape and is prefetched to the device once.
    """
    side = kernel + buffer
    half = buffer // 2

    if mode == "reference":
        ys = list(range(half, height - side, kernel))
        xs = list(range(half, width - side, kernel))
    elif mode == "cover":

        def axis_positions(dim):
            last = dim - half - kernel  # largest corner with a full halo
            if last < half:
                return []
            pos = sorted({min(p, last) for p in range(half, last + 1, kernel)})
            if pos[-1] != last:
                pos.append(last)
            return pos

        ys = axis_positions(height)
        xs = axis_positions(width)
    else:
        raise ValueError(f"unknown chip index mode: {mode!r}")

    if not ys or not xs:
        return np.zeros((0, 2), dtype=np.int32)
    yy, xx = np.meshgrid(np.asarray(ys, np.int32), np.asarray(xs, np.int32), indexing="ij")
    return np.stack([yy.ravel(), xx.ravel()], axis=-1)


def extract_chips(scene, indices, kernel: int = 256, buffer: int = 128):
    """Gather (N, side, side, C) chips from an (H, W, C) scene (jittable).

    Equivalent of utils/prediction_tools.py:111-131 but as a vmapped
    ``dynamic_slice`` so the gather compiles to one fused XLA op.
    ``indices`` are central-window corners as produced by
    :func:`generate_chip_indices`.
    """
    scene = jnp.asarray(scene)
    indices = jnp.asarray(indices, jnp.int32)
    side = kernel + buffer
    half = buffer // 2
    c = scene.shape[-1]

    def slice_one(yx):
        return jax.lax.dynamic_slice(
            scene, (yx[0] - half, yx[1] - half, 0), (side, side, c)
        )

    return jax.vmap(slice_one)(indices)


def center_crop(chips, kernel: int, buffer: int):
    """Crop the central kernel x kernel window from (..., side, side[, C])."""
    half = buffer // 2
    return chips[..., half : half + kernel, half : half + kernel, :] if chips.ndim >= 3 else chips


def stitch_chips(
    chip_preds,
    indices,
    out_shape,
    kernel: int = 256,
    buffer: int = 128,
    blend: str = "overwrite",
):
    """Scatter chip predictions back into a full-scene array (jittable).

    ``chip_preds`` is (N, side, side, C_out) model output (still carrying
    the halo); ``indices`` the matching (N, 2) central-window corners;
    ``out_shape`` the (H, W, C_out) scene shape.

    NOTE: this is the semantic reference implementation (scan of dynamic
    updates — simple, shape-agnostic). The production engine
    (inference.tiles.TiledInferenceEngine) stitches via reshape/transpose
    on the regular grid instead, which measured ~50x faster on v5e; use
    the engine for real scenes.

    blend modes:
    - ``"overwrite"``: place the central crop — the TPU-native equivalent of
      the reference's disjoint ``+=`` placement (utils/prediction_tools.py:
      147-154), since reference-mode central windows never overlap.
    - ``"sum"``: accumulate crops additively (the literal reference op).
    - ``"hann"``: feather the full halo-bearing chip with a separable
      Hann^0.5-window weight and normalize by total weight — removes tile
      seams when chips overlap (mode="cover" scenes); an improvement over
      the reference's hard crop.
    """
    chip_preds = jnp.asarray(chip_preds)
    indices = jnp.asarray(indices, jnp.int32)
    side = kernel + buffer
    half = buffer // 2
    h, w, c = out_shape
    out = jnp.zeros((h, w, c), chip_preds.dtype)

    if blend in ("overwrite", "sum"):
        crops = chip_preds[:, half : half + kernel, half : half + kernel, :]

        def body(acc, args):
            crop, yx = args
            if blend == "sum":
                cur = jax.lax.dynamic_slice(acc, (yx[0], yx[1], 0), (kernel, kernel, c))
                crop = crop + cur
            acc = jax.lax.dynamic_update_slice(acc, crop, (yx[0], yx[1], 0))
            return acc, None

        out, _ = jax.lax.scan(body, out, (crops, indices))
        return out

    if blend == "hann":
        n = jnp.arange(side, dtype=chip_preds.dtype)
        win1d = jnp.sqrt(jnp.clip(0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * (n + 0.5) / side), 1e-4))
        win = win1d[:, None] * win1d[None, :]
        wsum = jnp.zeros((h, w, 1), chip_preds.dtype)

        def body(carry, args):
            acc, wacc = carry
            chip, yx = args
            corner = (yx[0] - half, yx[1] - half, 0)
            cur = jax.lax.dynamic_slice(acc, corner, (side, side, c))
            acc = jax.lax.dynamic_update_slice(acc, cur + chip * win[..., None], corner)
            curw = jax.lax.dynamic_slice(wacc, corner, (side, side, 1))
            wacc = jax.lax.dynamic_update_slice(wacc, curw + win[..., None], corner)
            return (acc, wacc), None

        (out, wsum), _ = jax.lax.scan(body, (out, wsum), (chip_preds, indices))
        return out / jnp.maximum(wsum, 1e-8)

    raise ValueError(f"unknown blend mode: {blend!r}")
