"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_shapes: Optional[Sequence[Tuple[str, int]]] = None,
    devices=None,
) -> Mesh:
    """Create a Mesh; default is a 1-D ``data`` mesh over all devices.

    ``axis_shapes`` like [("data", 4), ("model", 2)]; a -1 size infers the
    remainder (like reshape).
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_shapes is None:
        axis_shapes = [("data", len(devices))]
    names = tuple(name for name, _ in axis_shapes)
    sizes = [size for _, size in axis_shapes]
    known = int(np.prod([s for s in sizes if s != -1]))
    sizes = [len(devices) // known if s == -1 else s for s in sizes]
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(f"mesh {sizes} does not cover {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-dim sharding: (B, ...) split along the data axis."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch onto the mesh, sharded along dim 0."""
    sharding = data_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def host_local_batch_to_global(batch, mesh: Mesh, axis: str = "data"):
    """Assemble a globally-sharded batch from per-host local shards.

    On a multi-host slice each process loads only its slice of the global
    batch (host-side data sharding, SURVEY.md §2.9); this stitches the
    local arrays into global jax.Arrays laid out along the data axis.
    Single-process meshes fall back to a plain sharded device_put.
    """
    if jax.process_count() == 1:
        return shard_batch(batch, mesh, axis)
    sharding = data_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )


def initialize_distributed(coordinator: Optional[str] = None, **kwargs):
    """Multi-host bootstrap (SURVEY.md §2.9): call once per process before
    building meshes on a multi-host slice, and before ANY other JAX call —
    probing the backend first (jax.devices/process_count) would pin the
    process single-host, which is why this guard uses is_initialized()
    rather than process_count(). No-op without a coordinator or when
    already initialized. Exercised for real by tests/test_multihost.py
    (2 CPU processes over Gloo)."""
    if coordinator is None or jax.distributed.is_initialized():
        return
    jax.distributed.initialize(coordinator_address=coordinator, **kwargs)
