"""Streaming segmentation metrics: confusion matrix, accuracy, mean IoU.

Reference: MeanIoU(num_classes=2) + categorical accuracy tracked during
training (solar notebook cell 17) and the confusion-matrix tooling
(utils/model_tools.py:1053-1126). Implemented as a pure accumulate/finalize
pair so metric state is a pytree that rides inside jit and sums across a
data-parallel mesh with one ``psum``.
"""

from __future__ import annotations

import jax.numpy as jnp


def confusion_matrix(y_true, y_pred, num_classes: int):
    """Dense (num_classes, num_classes) count matrix, rows = true class."""
    y_true = jnp.asarray(y_true).reshape(-1).astype(jnp.int32)
    y_pred = jnp.asarray(y_pred).reshape(-1).astype(jnp.int32)
    idx = y_true * num_classes + y_pred
    counts = jnp.bincount(idx, length=num_classes * num_classes)
    return counts.reshape(num_classes, num_classes).astype(jnp.float32)


def normalize_confusion_matrix(cm):
    """Row-normalize counts to rates — utils/model_tools.py:1111-1126."""
    cm = jnp.asarray(cm, jnp.float32)
    row = jnp.sum(cm, axis=1, keepdims=True)
    return cm / jnp.maximum(row, 1.0)


def mean_iou_from_cm(cm):
    """Keras-MeanIoU semantics: mean over classes of TP/(TP+FP+FN).

    Classes absent from both truth and prediction are excluded from the
    mean (Keras divides by the number of classes with nonzero union).
    """
    cm = jnp.asarray(cm, jnp.float32)
    tp = jnp.diagonal(cm)
    fp = jnp.sum(cm, axis=0) - tp
    fn = jnp.sum(cm, axis=1) - tp
    union = tp + fp + fn
    iou = jnp.where(union > 0, tp / jnp.maximum(union, 1e-12), 0.0)
    valid = jnp.sum((union > 0).astype(jnp.float32))
    return jnp.sum(iou) / jnp.maximum(valid, 1.0)


def accuracy_from_cm(cm):
    cm = jnp.asarray(cm, jnp.float32)
    return jnp.sum(jnp.diagonal(cm)) / jnp.maximum(jnp.sum(cm), 1.0)


def f1_from_cm(cm, positive_class: int = 1):
    """Binary F1 for a designated positive class."""
    cm = jnp.asarray(cm, jnp.float32)
    tp = cm[positive_class, positive_class]
    fp = jnp.sum(cm[:, positive_class]) - tp
    fn = jnp.sum(cm[positive_class, :]) - tp
    return 2.0 * tp / jnp.maximum(2.0 * tp + fp + fn, 1e-12)


def init_metric_state(num_classes: int):
    return jnp.zeros((num_classes, num_classes), jnp.float32)


def update_metric_state(state, y_true, y_pred):
    return state + confusion_matrix(y_true, y_pred, state.shape[0])


def finalize_metrics(state):
    return {
        "accuracy": accuracy_from_cm(state),
        "mean_iou": mean_iou_from_cm(state),
        "f1": f1_from_cm(state),
    }
