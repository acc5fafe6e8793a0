"""Mesh-sharded full-scene inference.

The TPU-native replacement for the reference's Dask map_overlap cluster
(utils/pc_tools.py:670-729, utils/model_tools.py:1271-1304, where every
worker re-downloads the model per chunk): weights live on the mesh once;
chip batches shard across devices along the batch axis, so one engine
forward processes ``n_devices`` x ``batch_size`` chips per step. Halo
handling is unchanged — each chip carries its own overlap buffer, the
spatial-domain analog of sequence parallelism (SURVEY.md §2.9).
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from satellite_computervision_tpu.inference.tiles import TiledInferenceEngine


def make_sharded_predict_fn(
    predict_fn: Callable, mesh: Mesh, data_axis: str = "data"
) -> Callable:
    """Wrap a chip-batch predict fn so its batch dim shards over the mesh."""
    batch_sharded = NamedSharding(mesh, P(data_axis))
    return jax.jit(
        predict_fn, in_shardings=(batch_sharded,), out_shardings=batch_sharded
    )


class ShardedTiledInference(TiledInferenceEngine):
    """TiledInferenceEngine whose per-batch forward runs data-parallel
    across a mesh. ``batch_size`` must be a multiple of the data-axis size.
    """

    def __init__(self, predict_fn, mesh: Mesh, data_axis: str = "data", **kwargs):
        if kwargs.get("batch_size", 16) % mesh.shape[data_axis]:
            raise ValueError(
                "batch_size must be divisible by the data-axis size "
                f"({mesh.shape[data_axis]})"
            )
        super().__init__(
            make_sharded_predict_fn(predict_fn, mesh, data_axis), **kwargs
        )
        self.mesh = mesh
