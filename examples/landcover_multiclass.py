"""Multiclass land-cover workflow: multiclass U-Net + generalized dice.

Mirrors the reference's land-cover/wetland story (multiclass
get_unet_model + gen_dice, SURVEY.md §2.1; UNETDataGenerator label path
with merge_classes + one-hot) on synthetic 4-class chips, then prints the
per-class confusion report (the reference's commented-out
make_confusion_matrix tooling, utils/model_tools.py:1053-1126).

Usage: python examples/landcover_multiclass.py [--steps N]
"""


# allow `python examples/<name>.py` from anywhere: put the repo root (the
# package home) and this directory (convergence_common) on sys.path
import os as _os
import sys as _sys

_here = _os.path.dirname(_os.path.abspath(__file__))
for _p in (_os.path.dirname(_here), _here):
    if _p not in _sys.path:
        _sys.path.insert(0, _p)

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from satellite_computervision_tpu.models import UNet, losses
from satellite_computervision_tpu.train import Trainer, create_train_state
from satellite_computervision_tpu.train.evaluate import (
    evaluate_confusion,
    format_confusion_report,
)

K, C, NCLASS = 32, 5, 4
CLASSES = ["water", "forest", "field", "built"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=240)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    sig_rng = np.random.default_rng(42)
    sigs = sig_rng.random((NCLASS, C)).astype(np.float32)

    def batch(b=8):
        labels = rng.integers(0, NCLASS, (b, K, K))
        for i in range(b):
            labels[i] = labels[i, ::8, ::8].repeat(8, 0).repeat(8, 1)
        x = sigs[labels] + rng.normal(0, 0.05, (b, K, K, C)).astype(np.float32)
        return x.astype(np.float32), np.eye(NCLASS, dtype=np.float32)[labels]

    model = UNet(n_classes=NCLASS, filters=(8, 16), factors=(2, 2), head="softmax")
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, K, K, C)), tx=optax.adam(2e-3)
    )
    loss_fn = lambda y, p: losses.gen_dice(y, p)
    trainer = Trainer(state, loss_fn, pred_key="probs", num_classes=NCLASS)

    t0 = time.time()
    for step in range(args.steps):
        trainer.state, out = trainer.train_step(
            trainer.state, batch(), jax.random.key(step)
        )
        if step % 20 == 0:
            print(f"step {step}: dice loss={float(out['loss']):.4f}")
    print(f"trained {args.steps} steps in {time.time() - t0:.1f}s")

    variables = {"params": trainer.state.params, "batch_stats": trainer.state.batch_stats}
    predict = lambda x: model.apply(variables, x)["classes"]
    report = evaluate_confusion(
        predict, [batch() for _ in range(4)], NCLASS, class_names=CLASSES
    )
    print(format_confusion_report(report))
    assert report["overall"]["mean_iou"] > 0.6, report["overall"]
    print("OK")


if __name__ == "__main__":
    main()
