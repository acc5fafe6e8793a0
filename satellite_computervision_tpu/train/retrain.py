"""Warm-start / continue-training flows.

Reference: retrain_model (utils/model_tools.py:1128-1176): load model +
weights (local or remote), evaluate to seed the checkpoint's best metric,
reset the learning rate, optionally freeze everything but the last layer.
"""

from __future__ import annotations

from typing import Optional

import jax
import optax

from satellite_computervision_tpu.train.checkpoint import (
    load_checkpoint,
    load_remote_weights,
)
from satellite_computervision_tpu.train.trainer import Trainer, TrainState


def freeze_mask(params, trainable_names):
    """Pytree of bools: True for every leaf under a *frozen* top-level
    subtree (everything not named in ``trainable_names``). Feed to
    ``optax.masked(optax.set_to_zero(), mask)`` — the reference freezes all
    but the final layer the Keras way (utils/model_tools.py:1173-1175)."""
    return {
        name: jax.tree_util.tree_map(lambda _: name not in trainable_names, subtree)
        for name, subtree in params.items()
    }


def retrain(
    state: TrainState,
    loss_fn,
    checkpoint_path: Optional[str] = None,
    weights_url: Optional[str] = None,
    eval_iter=None,
    learning_rate: Optional[float] = None,
    freeze_to: Optional[str] = None,
    pred_key: str = "logits",
    num_classes: int = 2,
    monitor: str = "mean_iou",
) -> Trainer:
    """Build a Trainer primed for continued training.

    - restore weights from a local checkpoint dir or an https msgpack blob;
    - optionally rebuild the optimizer with a fresh ``learning_rate``
      and/or freeze all parameter subtrees except ``freeze_to`` (e.g.
      ``"head"``);
    - evaluate on ``eval_iter`` so the best-checkpoint baseline starts at
      the restored model's metric (utils/model_tools.py:1164-1168).
    """
    if checkpoint_path:
        state, _ = load_checkpoint(checkpoint_path, state)
    if weights_url:
        params = load_remote_weights(weights_url, jax.device_get(state.params))
        state = state.replace(params=params)

    if learning_rate is not None or freeze_to is not None:
        tx = optax.adam(learning_rate if learning_rate is not None else 9e-4)
        if freeze_to is not None:
            tx = optax.chain(
                tx,
                optax.masked(optax.set_to_zero(), freeze_mask(state.params, {freeze_to})),
            )
        state = state.replace(tx=tx, opt_state=tx.init(state.params))

    trainer = Trainer(
        state, loss_fn, pred_key=pred_key, num_classes=num_classes, monitor=monitor
    )
    if eval_iter is not None:
        trainer.seed_best_from_eval(eval_iter)
    return trainer
