"""Jit-compiled training with BatchNorm state, metrics, and mesh sharding.

Replaces the reference's Keras ``model.fit`` (solar notebook cell 64) with
an explicit functional train step:

- ``TrainState`` = params + batch_stats + optimizer state (one pytree);
- the step is one jitted program: forward, loss, backward, optimizer
  update, BatchNorm running-stat update, streaming confusion-matrix
  metrics — no host round-trips inside an epoch;
- data parallelism is plain ``jax.jit`` over a ``Mesh``: batches sharded
  over the ``data`` axis, params replicated; XLA inserts the gradient
  ``psum`` (SURVEY.md §2.9's mandatory DP component).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import optax

from satellite_computervision_tpu.models import metrics as metrics_lib


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)


def create_train_state(
    model,
    rng,
    sample_input,
    tx: Optional[optax.GradientTransformation] = None,
    learning_rate: float = 9e-4,
    model_args: tuple = (),
) -> TrainState:
    """Initialize model variables + optimizer (Adam lr 9e-4 = the solar
    notebook's optimizer, cell 17)."""
    if tx is None:
        tx = optax.adam(learning_rate)
    variables = model.init(rng, sample_input, *model_args)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )


def make_train_step(
    loss_fn: Callable,
    pred_key: str = "logits",
    loss_on_logits: bool = True,
    num_classes: int = 2,
    class_from: str = "classes",
    donate: bool = True,
):
    """Build the jitted train step.

    ``loss_fn(y_true, y_pred) -> scalar``; ``pred_key`` picks which model
    head feeds it (the reference trains on 'logits'/'probs' heads,
    utils/model_tools.py:417-454).
    """

    def step(state: TrainState, batch, dropout_key=None):
        x, y = batch
        # multi-input families (Siamese before/after, hybrid unet+lstm,
        # LSTM-AE feats+harmonics) pass x as a tuple of positional args
        inputs = tuple(x) if isinstance(x, (tuple, list)) else (x,)

        def compute_loss(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            rngs = {"dropout": dropout_key} if dropout_key is not None else None
            out, mutated = state.apply_fn(
                variables, *inputs, train=True, mutable=["batch_stats"], rngs=rngs
            )
            # pred_key=None hands the full output dict to loss_fn
            # (multi-head losses: LSTM-AE temporal+single, hierarchical)
            preds = out[pred_key] if isinstance(out, dict) and pred_key else out
            loss = loss_fn(y, preds)
            return loss, (out, mutated["batch_stats"])

        (loss, (out, new_batch_stats)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        if isinstance(out, dict) and class_from in out and not isinstance(y, (tuple, list)):
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

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    loss_fn: Callable,
    pred_key: str = "logits",
    num_classes: int = 2,
    class_from: str = "classes",
):
    """Jitted eval step: forward (running BN stats), loss + confusion counts."""

    def step(state: TrainState, batch):
        x, y = batch
        inputs = tuple(x) if isinstance(x, (tuple, list)) else (x,)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        out = state.apply_fn(variables, *inputs, train=False)
        preds = out[pred_key] if isinstance(out, dict) and pred_key else out
        loss = loss_fn(y, preds)
        if isinstance(y, (tuple, list)):
            cm = jnp.zeros((num_classes, num_classes), jnp.float32)
        else:
            y_hat = out[class_from] if isinstance(out, dict) and class_from in out else preds
            y_int = jnp.argmax(y, -1) if y.shape[-1] > 1 else (y[..., 0] > 0.5)
            cm = metrics_lib.confusion_matrix(y_int, y_hat, num_classes)
        return {"loss": loss, "cm": cm}

    return jax.jit(step)


class Trainer:
    """Epoch loop with best-metric checkpointing and resume.

    Mirrors the reference training story: fit with steps_per_epoch,
    evaluate each epoch, checkpoint when the monitored metric improves
    (ModelCheckpoint save_best_only on val_mean_io_u, solar notebook cell
    61), and ``retrain``-style resume that re-seeds the best metric from a
    fresh evaluation (utils/model_tools.py:1128-1176).
    """

    def __init__(
        self,
        state: TrainState,
        loss_fn: Callable,
        pred_key: str = "logits",
        num_classes: int = 2,
        monitor: str = "mean_iou",
        mode: str = "max",
        checkpoint_manager=None,
        seed: int = 0,
    ):
        self.state = state
        self.train_step = make_train_step(loss_fn, pred_key, num_classes=num_classes)
        self.eval_step = make_eval_step(loss_fn, pred_key, num_classes=num_classes)
        self.num_classes = num_classes
        self.monitor = monitor
        self.mode = mode
        self.ckpt = checkpoint_manager
        self.best = float("-inf") if mode == "max" else float("inf")
        self._key = jax.random.key(seed)
        self.history: list = []

    def _improved(self, value: float) -> bool:
        return value > self.best if self.mode == "max" else value < self.best

    def evaluate(self, eval_iter) -> Dict[str, float]:
        cm = metrics_lib.init_metric_state(self.num_classes)
        # accumulate the loss ON DEVICE: a float() per batch forces a
        # device->host sync every step, which dominates wall time on
        # high-latency links (DEVNOTES: the TPU tunnel); one sync per
        # evaluation instead
        total_loss, n = None, 0
        for batch in eval_iter:
            out = self.eval_step(self.state, batch)
            cm = cm + out["cm"]
            total_loss = out["loss"] if total_loss is None else total_loss + out["loss"]
            n += 1
        result = {k: float(v) for k, v in metrics_lib.finalize_metrics(cm).items()}
        result["loss"] = float(total_loss) / n if n else 0.0
        return result

    def seed_best_from_eval(self, eval_iter):
        """Resume semantics: evaluate the restored model and use that as the
        checkpoint-best baseline (utils/model_tools.py:1164-1168)."""
        result = self.evaluate(eval_iter)
        self.best = result[self.monitor]
        return result

    def fit(
        self,
        train_iter,
        epochs: int,
        steps_per_epoch: int,
        eval_fn: Optional[Callable] = None,
        log_fn: Callable = print,
    ):
        train_it = iter(train_iter)
        for epoch in range(epochs):
            cm = metrics_lib.init_metric_state(self.num_classes)
            # device-side loss accumulation: one host sync per epoch, not
            # per step (a per-step float() stalls on link latency)
            running_loss = None
            for _ in range(steps_per_epoch):
                batch = next(train_it)
                self._key, sub = jax.random.split(self._key)
                self.state, out = self.train_step(self.state, batch, sub)
                cm = cm + out["cm"]
                running_loss = (
                    out["loss"] if running_loss is None else running_loss + out["loss"]
                )
            train_metrics = {
                k: float(v) for k, v in metrics_lib.finalize_metrics(cm).items()
            }
            train_metrics["loss"] = float(running_loss) / steps_per_epoch

            record = {"epoch": epoch, "train": train_metrics}
            # checkpoint-best on eval metrics when an eval stream exists
            # (the reference's val_mean_io_u ModelCheckpoint), else on train
            # metrics so eval-less workloads still keep their best state
            if eval_fn is not None:
                val = self.evaluate(eval_fn())
                record["val"] = val
                monitored = val
            else:
                monitored = train_metrics
            value = monitored.get(self.monitor)
            if value is not None and self._improved(value):
                self.best = value
                if self.ckpt is not None:
                    self.ckpt.save(self.state, step=int(self.state.step), metrics=monitored)
                record["checkpointed"] = True
            self.history.append(record)
            log_fn(record)
        return self.history
