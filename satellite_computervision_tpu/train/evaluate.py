"""Model evaluation reports: confusion matrices and per-class statistics.

Reference: the confusion-matrix tooling sketched at
utils/model_tools.py:1053-1126 (make_confusion_matrix_data /
make_confusion_matrix, commented out, + normalize_confusion_matrix) and
the notebook's `m.evaluate` flow. Here evaluation streams through the
jitted eval step and accumulates one confusion matrix on device.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import numpy as np

import jax.numpy as jnp

from satellite_computervision_tpu.models import metrics as metrics_lib


def evaluate_confusion(
    predict_classes: Callable,
    batches,
    num_classes: int,
    class_names: Optional[Sequence[str]] = None,
) -> Dict:
    """Run ``predict_classes(x) -> (B, H, W) int classes`` over (x, y)
    batches; return counts, rates, and per-class precision/recall/IoU/F1.

    ``y`` may be one-hot (argmaxed) or integer maps.
    """
    cm = metrics_lib.init_metric_state(num_classes)
    for x, y in batches:
        y = jnp.asarray(y)
        y_int = jnp.argmax(y, -1) if y.ndim == 4 and y.shape[-1] > 1 else jnp.squeeze(y, -1) if y.ndim == 4 else y
        cm = cm + metrics_lib.confusion_matrix(y_int, predict_classes(x), num_classes)

    counts = np.asarray(cm)
    rates = np.asarray(metrics_lib.normalize_confusion_matrix(cm))
    tp = np.diagonal(counts)
    fp = counts.sum(axis=0) - tp
    fn = counts.sum(axis=1) - tp
    union = tp + fp + fn
    with np.errstate(divide="ignore", invalid="ignore"):
        precision = np.where(tp + fp > 0, tp / (tp + fp), 0.0)
        recall = np.where(tp + fn > 0, tp / (tp + fn), 0.0)
        iou = np.where(union > 0, tp / union, 0.0)
        f1 = np.where(
            precision + recall > 0, 2 * precision * recall / (precision + recall), 0.0
        )

    names = list(class_names) if class_names else [str(i) for i in range(num_classes)]
    per_class = {
        name: {
            "precision": float(p),
            "recall": float(r),
            "iou": float(i),
            "f1": float(f),
            "support": int(s),
        }
        for name, p, r, i, f, s in zip(names, precision, recall, iou, f1, counts.sum(1))
    }
    overall = {k: float(v) for k, v in metrics_lib.finalize_metrics(cm).items()}
    return {
        "counts": counts,
        "rates": rates,
        "per_class": per_class,
        "overall": overall,
    }


def format_confusion_report(report: Dict) -> str:
    """Human-readable table of the evaluate_confusion output."""
    lines = ["class        prec   recall  iou    f1     support"]
    for name, row in report["per_class"].items():
        lines.append(
            f"{name:<12} {row['precision']:<6.3f} {row['recall']:<7.3f} "
            f"{row['iou']:<6.3f} {row['f1']:<6.3f} {row['support']}"
        )
    o = report["overall"]
    lines.append(
        f"overall      acc={o['accuracy']:.4f} mean_iou={o['mean_iou']:.4f} f1={o['f1']:.4f}"
    )
    return "\n".join(lines)
