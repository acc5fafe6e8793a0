"""Device-mesh parallelism: DP training, spatially sharded inference.

The reference has no accelerator parallelism at all (single-device
model.fit; Dask workers for inference — SURVEY.md §2.9). Here scaling is
native: ``jax.sharding.Mesh`` + NamedSharding under ``jit``, with XLA
inserting the ICI collectives. Multi-host bootstrap goes through
``jax.distributed.initialize`` (initialize_distributed helper).
"""

from satellite_computervision_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicate,
    shard_batch,
    host_local_batch_to_global,
    initialize_distributed,
)
from satellite_computervision_tpu.parallel.spatial import make_spatial_inference
from satellite_computervision_tpu.parallel.data_parallel import (
    make_parallel_train_step,
    shard_train_state,
)
from satellite_computervision_tpu.parallel.sharded_inference import (
    make_sharded_predict_fn,
    ShardedTiledInference,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicate",
    "shard_batch",
    "host_local_batch_to_global",
    "initialize_distributed",
    "make_parallel_train_step",
    "shard_train_state",
    "make_sharded_predict_fn",
    "ShardedTiledInference",
    "make_spatial_inference",
]
