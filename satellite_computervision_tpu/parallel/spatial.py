"""Spatial-domain sharding of full-scene inference with ICI halo exchange.

SURVEY.md §2.9: the reference's only "long context" is spatial extent,
handled by overlap-tile decomposition (utils/prediction_tools.py:87-156)
and Dask chunking with halos (utils/pc_tools.py:707-718). The TPU-native
equivalent here shards the SCENE itself across a mesh axis: each device
owns a horizontal band of rows, exchanges ``buffer/2``-row halos with its
neighbors over ICI (``jax.lax.ppermute`` — the conv analog of
ring-attention halo passing), and runs the overlap-tile grid on its local
band. One ``shard_map`` program, no host involvement, no Dask workers,
no per-worker model downloads.
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
    n_dev = mesh.shape[axis]
    side = kernel + buffer
    half = buffer // 2
    c_out = out_channels

    def local_band_predict(band, cols):
        """(Hl + buffer, W', C) haloed band -> (Hl, cols*kernel, c_out)."""
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
            scene.astype(jnp.float32),
            ((half, h_pad + half - h), (half, w_pad + half - w), (0, 0)),
            mode="edge",
        )
        # scene_p rows: h_pad + buffer; strip the global halos so shards
        # split evenly, then re-exchange halos on-device.
        core = scene_p[half : half + h_pad]
        top_halo = scene_p[:half]
        bottom_halo = scene_p[half + h_pad :]

        shape_key = (h, w, c)
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
                return local_band_predict(band, cols)

            compiled[shape_key] = jax.jit(sharded)

        out = compiled[shape_key](core, top_halo, bottom_halo)
        return out[:h, :w]

    return run
