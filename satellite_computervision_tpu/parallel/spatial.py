"""Spatial-domain sharding of full-scene inference with ICI halo exchange.

SURVEY.md §2.9: the reference's only "long context" is spatial extent,
handled by overlap-tile decomposition (utils/prediction_tools.py:87-156)
and Dask chunking with halos (utils/pc_tools.py:707-718). The TPU-native
equivalent here shards the SCENE itself across a mesh axis: each device
owns a horizontal band of rows, exchanges halos with its neighbors over
ICI (``jax.lax.ppermute`` — the conv analog of ring-attention halo
passing), and runs the overlap-tile grid on its local band. One
``shard_map`` program, no host involvement, no Dask workers, no
per-worker model downloads.

Feature parity with the single-device TiledInferenceEngine (the mesh
path must not force a quality downgrade to scale — the reference's
distributed scene path is utils/pc_tools.py:670-729):

- ``blend="hann"``: seam-free feathered blending. Each device's band
  carries one extra halo CHIP row per side (kernel + buffer/2 rows over
  ICI) so every core pixel sums its complete chip set; phantom chips
  outside the scene grid are masked by global row index, and the
  normalizer is the same global hann weight canvas the engine uses,
  sharded by rows — the math per output pixel is identical to the
  single-device program.
- ``preprocess_fn`` / ``output_transform`` fuse into the sharded program
  (uint16-in / uint8-out scenes, derived bands on device). The
  preprocess must be row-local (pointwise per pixel — true of every
  reference preprocess) since each device applies it to its own band.
- ``max_rows``: scenes taller than this stream through in full-width
  bands, each band sharded across the mesh (the banded-streaming +
  mesh composition).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.5 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_spatial_inference(
    predict_fn: Callable,
    mesh: Mesh,
    axis: str = "data",
    kernel: int = 256,
    buffer: int = 128,
    out_channels: int = 1,
    batch_size: int = 16,
    tile_mode: str = "chips",
    whole_multiple: Optional[int] = 32,
    blend: str = "overwrite",
    preprocess_fn: Optional[Callable] = None,
    output_transform: Optional[Callable] = None,
    max_rows: Optional[int] = None,
):
    """Build ``run(scene) -> prediction`` with rows sharded over ``axis``.

    ``predict_fn``: (B, side, side, C_in) -> (B, side, side, C_out).
    The returned function accepts any (H, W, C) scene; it is edge-padded
    so each device's band is a multiple of ``kernel`` rows, and the
    prediction is cropped back to (H, W, out_channels).

    ``tile_mode="whole"``: each device runs ONE fully-convolutional
    forward over its haloed row band instead of the local chip grid —
    the multi-device form of TiledInferenceEngine(tile_mode="whole"):
    no window-overlap FLOPs, no gather/stitch, seams only possible at
    band boundaries where the halo (buffer/2 rows) caps the receptive
    field — exactly the context a chip would have had.
    """
    if tile_mode not in ("chips", "whole"):
        raise ValueError(f"unknown tile_mode {tile_mode!r}")
    if blend not in ("overwrite", "hann"):
        raise ValueError(f"unknown blend mode {blend!r}")
    if blend == "hann" and tile_mode == "whole":
        raise ValueError("whole mode has no tiles to blend; use blend='overwrite'")
    if blend == "hann" and buffer > kernel:
        raise ValueError("hann blending requires buffer <= kernel")
    n_dev = mesh.shape[axis]
    side = kernel + buffer
    half = buffer // 2
    c_out = out_channels

    if blend == "hann":
        return _make_hann_sharded(
            predict_fn, mesh, axis, kernel, buffer, c_out, batch_size,
            preprocess_fn, output_transform, max_rows,
        )

    def local_band_predict(band, cols):
        """(Hl + buffer, W', C) haloed band -> (Hl, cols*kernel, c_out)."""
        if preprocess_fn is not None:
            band = preprocess_fn(band)
        band = band.astype(jnp.float32)
        hl = band.shape[0] - buffer
        if tile_mode == "whole":
            # guard (default 32, matching TiledInferenceEngine): a
            # fully-conv model with total downsampling D needs band dims
            # divisible by D — whole_multiple=D gives a guided error
            # instead of a deep reshape failure (None disables)
            if whole_multiple and any(d % whole_multiple for d in band.shape[:2]):
                raise ValueError(
                    f"whole-band shape {band.shape[:2]} is not a multiple of "
                    f"whole_multiple={whole_multiple}; pick kernel/buffer "
                    f"(and scene width) that are, or set whole_multiple to "
                    f"the model's downsampling factor"
                )
            pred = predict_fn(band[None])[0].astype(jnp.float32)
            return pred[half : half + hl, half : half + cols * kernel]
        rows = hl // kernel
        n = rows * cols
        corners = np.asarray(
            [(r * kernel, c * kernel) for r in range(rows) for c in range(cols)],
            np.int32,
        )
        n_pad = (-n) % batch_size
        if n_pad:
            corners = np.concatenate([corners, np.repeat(corners[-1:], n_pad, 0)])

        def one(yx):
            return jax.lax.dynamic_slice(
                band, (yx[0], yx[1], 0), (side, side, band.shape[2])
            )

        # unrolled batched forwards bound per-device activation memory,
        # same as the single-device engine
        preds = jnp.concatenate(
            [
                predict_fn(jax.vmap(one)(jnp.asarray(g))).astype(jnp.float32)
                for g in corners.reshape(-1, batch_size, 2)
            ]
        )[:n]
        crops = preds[:, half : half + kernel, half : half + kernel, :]
        return (
            crops.reshape(rows, cols, kernel, kernel, c_out)
            .transpose(0, 2, 1, 3, 4)
            .reshape(rows * kernel, cols * kernel, c_out)
        )

    compiled = {}

    def run(scene):
        h, w, c = scene.shape
        # global geometry: rows per device, a multiple of kernel
        rows_per_dev = -(-h // (n_dev * kernel)) * kernel
        h_pad = rows_per_dev * n_dev
        cols = -(-w // kernel)
        w_pad = cols * kernel
        scene_p = jnp.pad(
            jnp.asarray(scene),
            ((half, h_pad + half - h), (half, w_pad + half - w), (0, 0)),
            mode="edge",
        )
        # scene_p rows: h_pad + buffer; strip the global halos so shards
        # split evenly, then re-exchange halos on-device.
        core = scene_p[half : half + h_pad]
        top_halo = scene_p[:half]
        bottom_halo = scene_p[half + h_pad :]

        shape_key = (h, w, c, str(scene_p.dtype))
        if shape_key not in compiled:

            @functools.partial(
                shard_map,
                mesh=mesh,
                in_specs=(P(axis, None, None), P(None, None, None), P(None, None, None)),
                out_specs=P(axis, None, None),
            )
            def sharded(local, top, bottom):
                # halo exchange over ICI: my first/last `half` rows go to
                # my neighbors; edge devices take the global edge-padding.
                idx = jax.lax.axis_index(axis)
                down = jax.lax.ppermute(
                    local[-half:], axis, [(i, i + 1) for i in range(n_dev - 1)]
                )
                up = jax.lax.ppermute(
                    local[:half], axis, [(i + 1, i) for i in range(n_dev - 1)]
                )
                prev_rows = jnp.where(idx == 0, top, down)
                next_rows = jnp.where(idx == n_dev - 1, bottom, up)
                band = jnp.concatenate([prev_rows, local, next_rows], axis=0)
                out = local_band_predict(band, cols)
                if output_transform is not None:
                    out = output_transform(out)
                return out

            compiled[shape_key] = jax.jit(sharded)

        out = compiled[shape_key](core, top_halo, bottom_halo)
        return out[:h, :w]

    if max_rows is None:
        return run
    # one halo chip row per interior side: band-edge chips then read REAL
    # neighbor rows (the halo row's span) instead of edge-replication, so
    # kept pixels equal the unbanded result
    return _banded(run, kernel, buffer, out_channels, max_rows, halo_rows=1)


def _make_hann_sharded(
    predict_fn, mesh, axis, kernel, buffer, c_out, batch_size,
    preprocess_fn, output_transform, max_rows,
):
    """Row-sharded seam-free hann inference.

    Per-pixel math matches inference/tiles.py's quadrant-decomposed hann
    blend exactly: same chip set (phantom rows masked by global index),
    same quadrant summation order, same global weight normalizer (its
    rows sharded alongside the scene).
    """
    from satellite_computervision_tpu.pallas.stitch import (
        hann_inverse_weights,
        hann_window_1d,
    )

    n_dev = mesh.shape[axis]
    side = kernel + buffer
    half = buffer // 2
    halo_px = kernel + half  # one halo chip row + its buffer context

    compiled = {}

    def run_core(scene):
        h, w, c = scene.shape
        rows_total = -(-h // kernel)  # real chip rows (the engine's grid)
        rpd = -(-rows_total // n_dev)  # chip rows per device
        if rpd * kernel < halo_px:
            raise ValueError(
                f"scene of {rows_total} chip rows over {n_dev} devices gives "
                f"{rpd * kernel} rows/device < halo {halo_px}; use fewer "
                "devices or taller scenes"
            )
        R = rpd * n_dev  # padded grid rows
        cols = -(-w // kernel)
        w_pad = cols * kernel

        scene = jnp.asarray(scene)
        scene_p = jnp.pad(
            scene,
            ((half, R * kernel + half - h), (half, w_pad + half - w), (0, 0)),
            mode="edge",
        )
        core = scene_p[half : half + R * kernel]
        # edge strips: the halo band content outside the scene grid —
        # only their last/first `half` rows feed real (unmasked) chips,
        # exactly the engine's edge padding
        top_strip = jnp.concatenate(
            [jnp.repeat(scene_p[:1], halo_px - half, axis=0), scene_p[:half]], axis=0
        )
        bottom_strip = jnp.concatenate(
            [scene_p[half + R * kernel :],
             jnp.repeat(scene_p[-1:], halo_px - half, axis=0)], axis=0
        )

        # the engine's constant normalizer for THIS scene's grid, rows
        # sharded with the output (pallas.stitch.hann_inverse_weights is
        # the single source of truth — bitwise the same constant)
        inv2d = hann_inverse_weights(rows_total, cols, kernel, side)
        inv_grid = np.ones((R * kernel, cols * kernel), np.float32)
        usable = min(R * kernel, (rows_total + 1) * kernel - half)
        inv_grid[:usable] = inv2d[half : half + usable, half : half + cols * kernel]
        inv_grid = jnp.asarray(inv_grid)

        win = jnp.asarray(hann_window_1d(side))
        win2 = (win[:, None] * win[None, :])[..., None]

        shape_key = (h, w, c, str(scene_p.dtype))
        if shape_key not in compiled:
            rows_ext = rpd + 2  # core chip rows + one halo row per side
            n_chips = rows_ext * cols
            corners = np.asarray(
                [(r * kernel, ci * kernel) for r in range(rows_ext) for ci in range(cols)],
                np.int32,
            )
            n_pad = (-n_chips) % batch_size
            if n_pad:
                corners = np.concatenate([corners, np.repeat(corners[-1:], n_pad, 0)])

            @functools.partial(
                shard_map,
                mesh=mesh,
                in_specs=(
                    P(axis, None, None),  # core rows
                    P(None, None, None),  # top strip
                    P(None, None, None),  # bottom strip
                    P(axis, None),        # normalizer rows
                ),
                out_specs=P(axis, None, None),
            )
            def sharded(local, top, bottom, inv_local):
                idx = jax.lax.axis_index(axis)
                down = jax.lax.ppermute(
                    local[-halo_px:], axis, [(i, i + 1) for i in range(n_dev - 1)]
                )
                up = jax.lax.ppermute(
                    local[:halo_px], axis, [(i + 1, i) for i in range(n_dev - 1)]
                )
                prev_rows = jnp.where(idx == 0, top, down)
                next_rows = jnp.where(idx == n_dev - 1, bottom, up)
                band = jnp.concatenate([prev_rows, local, next_rows], axis=0)
                if preprocess_fn is not None:
                    band = preprocess_fn(band)
                band = band.astype(jnp.float32)
                c_in = band.shape[2]

                def one(yx):
                    return jax.lax.dynamic_slice(
                        band, (yx[0], yx[1], 0), (side, side, c_in)
                    )

                preds = jnp.concatenate(
                    [
                        predict_fn(jax.vmap(one)(jnp.asarray(g))).astype(jnp.float32)
                        for g in corners.reshape(-1, batch_size, 2)
                    ]
                )[:n_chips]

                # mask phantom chip rows: global chip row of local row r is
                # idx*rpd + r - 1; valid iff inside the scene's real grid
                # (kills the edge halos and the bottom padding rows)
                local_rows = jnp.arange(rows_ext)
                g_rows = idx * rpd + local_rows - 1
                row_ok = ((g_rows >= 0) & (g_rows < rows_total)).astype(jnp.float32)
                mask = jnp.repeat(row_ok, cols)[: n_chips, None, None, None]
                weighted = preds * win2 * mask

                # quadrant-decomposed scatter-free blend — the same ops,
                # in the same order, as the engine's (inference/tiles.py)
                pad_to = 2 * kernel
                canvas_h = (rows_ext + 1) * kernel
                canvas_w = (cols + 1) * kernel
                blocks = weighted.reshape(rows_ext, cols, side, side, c_out)
                blocks = jnp.pad(
                    blocks,
                    ((0, 0), (0, 0), (0, pad_to - side), (0, pad_to - side), (0, 0)),
                )
                quads = (
                    blocks.reshape(rows_ext, cols, 2, kernel, 2, kernel, c_out)
                    .transpose(2, 4, 0, 3, 1, 5, 6)
                    .reshape(2, 2, rows_ext * kernel, cols * kernel, c_out)
                )
                acc = jnp.zeros((canvas_h, canvas_w, c_out), jnp.float32)
                for a in (0, 1):
                    for b in (0, 1):
                        acc = acc + jnp.pad(
                            quads[a, b],
                            (
                                (a * kernel, canvas_h - rows_ext * kernel - a * kernel),
                                (b * kernel, canvas_w - cols * kernel - b * kernel),
                                (0, 0),
                            ),
                        )
                # core grid rows start at chip row 1 -> canvas kernel+half
                out = jax.lax.dynamic_slice(
                    acc, (kernel + half, half, 0), (rpd * kernel, cols * kernel, c_out)
                )
                out = out * inv_local[..., None]
                if output_transform is not None:
                    out = output_transform(out)
                return out

            compiled[shape_key] = jax.jit(sharded)

        out = compiled[shape_key](core, top_strip, bottom_strip, inv_grid)
        return out[:h, :w]

    if max_rows is None:
        return run_core
    # TWO halo chip rows per interior side: the inner one completes every
    # kept pixel's chip set with full real context; the outer one (whose
    # own context is edge-replicated by run_core) has a window that never
    # reaches a kept row (its last row is (g+1)*kernel + buffer/2 - 1 <
    # the kept region, since buffer <= kernel) — so banded == unbanded
    return _banded(run_core, kernel, buffer, c_out, max_rows, halo_rows=2)


def _banded(run_core, kernel, buffer, c_out, max_rows, halo_rows):
    """Stream a tall scene through ``run_core`` in full-width bands.

    Bands are cut on the chip grid with ``halo_rows`` extra chip rows per
    interior side (hann needs one so every core pixel sums its full chip
    set; overwrite needs none — its half-pixel context rides inside the
    band via edge slicing of real scene rows). Each band runs as a
    standalone sharded scene; only core rows are kept, so band-local
    blending equals the whole-scene result for every kept pixel (the same
    argument as TiledInferenceEngine._predict_banded)."""
    half = buffer // 2

    def run(scene):
        scene = np.asarray(scene)
        h, w, _ = scene.shape
        if h <= max_rows:
            return run_core(scene)
        band_rows = (max_rows - buffer) // kernel
        if band_rows <= 2 * halo_rows:
            raise ValueError("max_rows too small for kernel+buffer+halo")
        rows_total = -(-h // kernel)
        step = band_rows - 2 * halo_rows
        out = None
        r0 = 0
        while r0 < rows_total:
            rb = min(step, rows_total - r0)
            e_top = min(halo_rows, r0)
            e_bot = min(halo_rows, rows_total - r0 - rb)
            y_lo = (r0 - e_top) * kernel
            y_hi = min(h, (r0 + rb + e_bot) * kernel)
            piece = np.asarray(run_core(scene[y_lo:y_hi]))
            if out is None:
                out = np.zeros((h, w, c_out), piece.dtype)
            y = r0 * kernel
            hi = min(y + rb * kernel, h)
            out[y:hi] = piece[e_top * kernel : e_top * kernel + hi - y]
            r0 += rb
        return jnp.asarray(out)

    return run
