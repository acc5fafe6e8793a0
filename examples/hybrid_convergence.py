#!/usr/bin/env python
"""Hybrid U-Net+ConvLSTM convergence: quality evidence for the hybrid
family — the reference's wetland/landcover workhorse.

The reference's hybrid model (get_hybrid_model,
utils/model_tools.py:874-920) fuses a U-Net branch over single-date
NAIP-scale imagery with a ConvLSTM branch over a coarser Sentinel
timeseries (nearest-resized up to the NAIP grid), trained with weighted
categorical CE; HybridDataGenerator (utils/processing.py:1051-1184)
feeds it NAIP chips plus (T, H/3, W/3, C) S2 series. Real chips are
cloud exports this environment cannot fetch, so this harness trains the
full two-branch model under the reference objective on procedural chips
sharing the hierarchical harness's design:

- six classes in contiguous patches; grass and crop spectrally IDENTICAL
  in the single-date image, separable only via seasonal amplitude in the
  timeseries — so convergence on iou_crop demonstrates the fusion works
  (the U-Net branch alone cannot resolve it);
- the series is block-averaged 3x coarser than the U-Net input, matching
  the reference's NAIP (1 m) vs S2 (10 m) scale gap and its
  factors=(3,2,2,2) first-level downsample.

Usage (~8 min on the tunnel v5e):
  python examples/hybrid_convergence.py --out runs/hybrid_convergence.jsonl
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
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from convergence_common import (  # noqa: E402
    AMPS,
    CLASSES,
    NCLASS,
    PERIOD,
    SIGS,
    multiclass_metrics,
    smooth_field,
    stable_seed,
)
from satellite_computervision_tpu.models import HybridUNetLSTM, losses  # noqa: E402
from satellite_computervision_tpu.models import metrics as metrics_lib  # noqa: E402
from satellite_computervision_tpu.train import create_train_state  # noqa: E402
from satellite_computervision_tpu.train.trainer import make_train_step  # noqa: E402

K, T, NB = 96, 6, 4  # U-Net grid 96^2 (divisible by 3*2*2*2), 6-step series
KS = K // 3  # series grid: 3x coarser (NAIP 1 m vs S2 ~3 m analog)


def make_chip(split: str, index: int):
    """Deterministic ((K,K,4) f16 NAIP-scale image, (T,KS,KS,4) f16
    coarse series, (K,K,6) u8 one-hot labels)."""
    rng = np.random.default_rng(stable_seed(split, index))

    bias = np.array([-0.5, 0.2, 0.2, 0.2, -0.1, -0.4], np.float32)
    fields = np.stack([
        smooth_field(rng, K, scale=32) + bias[c] for c in range(NCLASS)
    ])
    label = np.argmax(fields, axis=0).astype(np.int32)

    base = SIGS[label]
    illum = rng.uniform(0.85, 1.15)

    img = base * illum + rng.normal(0, 0.03, base.shape)
    img = img + 0.05 * smooth_field(rng, K, scale=16)[..., None]
    img = np.clip(img, 0, 1.5).astype(np.float16)

    # coarse seasonal series: block-average the fine grid 3x, then cycle
    t0 = rng.uniform(0, PERIOD)
    t = (t0 + np.arange(T)).reshape(T, 1, 1, 1)
    season = np.sin(2 * np.pi * t / PERIOD)
    season_dir = np.array([-0.3, 0.4, 0.0, 1.0], np.float32)
    amp = AMPS[label][..., None]
    fine = base[None] + amp[None] * season * season_dir  # (T, K, K, 4)
    coarse = fine.reshape(T, KS, 3, KS, 3, NB).mean(axis=(2, 4))
    coarse = coarse * illum + rng.normal(0, 0.03, coarse.shape)
    series = np.clip(coarse, 0, 1.5).astype(np.float16)

    onehot = np.eye(NCLASS, dtype=np.uint8)[label]
    return img, series, onehot


def batches(split, n, batch, rng, shuffle=True):
    order = np.arange(n)
    if shuffle:
        rng.shuffle(order)
    for i in range(0, n - batch + 1, batch):
        chips = [make_chip(split, int(j)) for j in order[i : i + batch]]
        img, ser, y = (np.stack(z) for z in zip(*chips))
        yield jax.device_put(((img, ser), y))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train-size", type=int, default=640)
    ap.add_argument("--eval-size", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=9e-4)
    ap.add_argument("--lstm-features", type=int, default=32)
    ap.add_argument("--out", default="runs/hybrid_convergence.jsonl")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    model = HybridUNetLSTM(
        n_classes=NCLASS, lstm_features=args.lstm_features, dtype=jnp.bfloat16,
    )
    state = create_train_state(
        model, jax.random.key(args.seed), jnp.zeros((1, K, K, NB)),
        tx=optax.adam(args.lr),
        model_args=(jnp.zeros((1, T, KS, KS, NB)),),
    )

    weights = [2.0, 1.0, 1.0, 1.0, 1.0, 2.0]
    loss_fn = lambda y, p: losses.weighted_categorical_crossentropy(
        y, p, weights, reduce_mean=True)
    train_step = make_train_step(loss_fn, pred_key="probs", num_classes=NCLASS)

    @jax.jit
    def eval_batch(state, x, y):
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            *x, train=False,
        )
        cm = metrics_lib.confusion_matrix(
            jnp.argmax(y, -1), out["classes"], NCLASS)
        return loss_fn(y, out["probs"]), cm

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "a") as log:
        print(f"hybrid convergence: {args.train_size} chips x {args.epochs} "
              f"epochs, batch {args.batch_size}, {NCLASS} classes")

        rng = np.random.default_rng(args.seed)
        key = jax.random.key(args.seed + 1)
        best, best_miou = None, float("-inf")
        for epoch in range(args.epochs):
            t0 = time.time()
            tloss, steps = None, 0
            for x, y in batches("train", args.train_size, args.batch_size, rng):
                key, sub = jax.random.split(key)
                state, out = train_step(state, (x, y), sub)
                tloss = out["loss"] if tloss is None else tloss + out["loss"]
                steps += 1

            cm = np.zeros((NCLASS, NCLASS), np.float64)
            eloss, esteps = None, 0
            for x, y in batches("eval", args.eval_size, args.batch_size, rng,
                                shuffle=False):
                loss, bcm = eval_batch(state, x, y)
                cm += np.asarray(bcm, np.float64)
                eloss = loss if eloss is None else eloss + loss
                esteps += 1

            m = multiclass_metrics(cm, CLASSES)
            rec = {
                "epoch": epoch,
                "train_loss": float(tloss) / max(steps, 1),
                "eval_loss": float(eloss) / max(esteps, 1),
                **{k: round(float(v), 4) for k, v in m.items()},
                "secs": round(time.time() - t0, 1),
            }
            # unrounded monitor, tracked apart from the rounded record
            if m["mean_iou"] >= best_miou:
                best_miou = float(m["mean_iou"])
                best = {"epoch": epoch,
                        **{k: round(float(v), 4) for k, v in m.items()
                           if k != "iou"}}
            print(json.dumps(rec))
            log.write(json.dumps(rec) + "\n")
            log.flush()

        summary = {"final": best, "config": vars(args)}
        print("SUMMARY " + json.dumps(summary))
        log.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
