"""Data-parallel training over a device mesh.

SURVEY.md §2.9's mandatory parallelism component: params replicated,
batches sharded over the ``data`` axis, gradients reduced over ICI. Under
``jax.jit`` with NamedShardings this is fully compiler-driven — the
gradient all-reduce is inserted by XLA, and BatchNorm statistics are
computed over the *global* batch because the jitted program has the global
view (no axis_name plumbing needed; that's only for shard_map/pmap).
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from satellite_computervision_tpu.models import metrics as metrics_lib
from satellite_computervision_tpu.train.trainer import TrainState

import jax.numpy as jnp
import optax


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Replicate a TrainState across the mesh."""
    replicated = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, replicated), state)


def make_parallel_train_step(
    loss_fn: Callable,
    mesh: Mesh,
    pred_key: str = "logits",
    num_classes: int = 2,
    class_from: str = "classes",
    data_axis: str = "data",
):
    """Jitted DP train step: donates state, shards (x, y) along
    ``data_axis``, returns replicated state + metrics."""
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(data_axis))

    def step(state: TrainState, batch, dropout_key):
        x, y = batch

        def compute_loss(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            out, mutated = state.apply_fn(
                variables,
                x,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_key},
            )
            preds = out[pred_key] if isinstance(out, dict) else out
            return loss_fn(y, preds), (out, mutated["batch_stats"])

        (loss, (out, new_batch_stats)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        if isinstance(out, dict) and class_from in out:
            y_hat = out[class_from]
            y_int = jnp.argmax(y, -1) if y.shape[-1] > 1 else (y[..., 0] > 0.5)
            cm = metrics_lib.confusion_matrix(y_int, y_hat, num_classes)
        else:
            cm = jnp.zeros((num_classes, num_classes), jnp.float32)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )
        return new_state, {"loss": loss, "cm": cm}

    return jax.jit(
        step,
        in_shardings=(None, (batch_sharded, batch_sharded), None),
        out_shardings=(None, replicated),
        donate_argnums=(0,),
    )
