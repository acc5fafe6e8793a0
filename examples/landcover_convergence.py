#!/usr/bin/env python
"""Multiclass land-cover convergence run: quality evidence for the
gen_dice / weighted-categorical-crossentropy loss paths at workload scale.

The reference's land-cover story trains a multiclass model on NAIP RGBN
chips with Chesapeake-style merged classes (UNETDataGenerator label path
with merge_classes, utils/processing.py:460-520; the losses are
utils/model_tools.py:25-94). Its real chips are cloud exports this
environment cannot fetch (zero egress), so — exactly like
solar_convergence — this harness trains a FULL multiclass U-Net under the
reference's optimization config (LANDCOVER_CONFIG: 4 NAIP bands, 256^2
chips, batch 8, Adam 9e-4, 8 classes) on procedurally generated chips
with the structure that makes land-cover mapping hard:

- contiguous class regions (argmax of per-class smooth random fields,
  like real landscape patches), not iid pixel labels;
- spectrally confusable class pairs (tree vs wetland vs water; road vs
  impervious; grass vs crop) under per-chip illumination drift;
- sub-patch structures: building rectangles and thin roads that cut
  through the natural background classes.

Per-epoch metrics come from the streaming confusion matrix: mean IoU,
accuracy, and PER-CLASS IoU for all 8 classes. `--loss` selects
gen_dice or wcce so both reference loss paths are exercised to
convergence (VERDICT r3 #3); both runs append to the same JSONL with the
loss recorded per row.

Usage (~8 min per loss on the tunnel v5e):
  python examples/landcover_convergence.py --loss gen_dice \
      --out runs/landcover_convergence.jsonl
  python examples/landcover_convergence.py --loss wcce \
      --out runs/landcover_convergence.jsonl
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

import numpy as np

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from convergence_common import (  # noqa: E402
    multiclass_metrics,
    run_convergence,
    smooth_field,
    stable_seed,
)
from satellite_computervision_tpu.models import UNet, losses  # noqa: E402
from satellite_computervision_tpu.train import create_train_state  # noqa: E402
from satellite_computervision_tpu.train.trainer import (  # noqa: E402
    make_eval_step,
    make_train_step,
)

K = 256
CLASSES = ["water", "tree", "grass", "barren",
           "impervious", "road", "crop", "wetland"]
NCLASS = len(CLASSES)

# per-class (R, G, B, N) reflectance means on NAIP's 0-1 scale — chosen
# so the confusable pairs overlap (tree/wetland/water share low visible;
# road/impervious share grey visible; grass/crop share green+NIR)
SIGS = np.array([
    [0.10, 0.14, 0.20, 0.06],   # water
    [0.14, 0.24, 0.13, 0.58],   # tree
    [0.34, 0.44, 0.24, 0.52],   # grass
    [0.55, 0.50, 0.44, 0.38],   # barren
    [0.56, 0.56, 0.56, 0.30],   # impervious
    [0.32, 0.32, 0.34, 0.16],   # road (darker grey, low NIR)
    [0.42, 0.50, 0.28, 0.66],   # crop (brighter green, high NIR)
    [0.17, 0.26, 0.20, 0.42],   # wetland (tree-water mix)
], np.float32)
NB = SIGS.shape[1]

# natural background classes laid out as contiguous patches
NATURAL = [0, 1, 2, 3, 6, 7]  # water, tree, grass, barren, crop, wetland


def make_chip(split: str, index: int):
    """Deterministic ((K,K,4) float16 NAIP chip, (K,K,8) uint8 one-hot)."""
    rng = np.random.default_rng(stable_seed(split, index))

    # contiguous regions: per-class smooth field + bias, argmax wins.
    # biases tilt the mix so rarer classes (water, wetland) form fewer,
    # smaller patches — realistic class imbalance for the weighted losses
    bias = np.array([-0.55, 0.25, 0.30, -0.05, 0.0, 0.0, 0.05, -0.45],
                    np.float32)
    fields = np.stack([
        smooth_field(rng, K, scale=32) + bias[c] for c in NATURAL
    ])
    label = np.asarray(NATURAL, np.int32)[np.argmax(fields, axis=0)]

    # buildings: impervious rectangles (60% of chips, 1-4 of them)
    if rng.random() < 0.6:
        for _ in range(int(rng.integers(1, 5))):
            h, w = (int(v) for v in rng.integers(10, 42, 2))
            y, x = int(rng.integers(0, K - h)), int(rng.integers(0, K - w))
            label[y : y + h, x : x + w] = 4
    # roads: thin straight cuts (70% of chips)
    if rng.random() < 0.7:
        for _ in range(int(rng.integers(1, 3))):
            w = int(rng.integers(3, 7))
            pos = int(rng.integers(0, K - w))
            if rng.random() < 0.5:
                label[pos : pos + w, :] = 5
            else:
                label[:, pos : pos + w] = 5

    chip = SIGS[label]
    # per-chip illumination drift + within-class texture
    chip = chip * rng.uniform(0.85, 1.15) + rng.uniform(-0.03, 0.03)
    chip = chip + rng.normal(0, 0.035, chip.shape).astype(np.float32)
    chip = chip + 0.05 * smooth_field(rng, K, scale=16)[..., None]

    onehot = np.eye(NCLASS, dtype=np.uint8)[label]
    return np.clip(chip, 0, 1).astype(np.float16), onehot


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--loss", choices=["gen_dice", "wcce"], default="gen_dice")
    ap.add_argument("--gdl-counts", choices=["element", "batch"],
                    default="batch",
                    help="gen_dice class-count pooling: 'batch' = Sudre et "
                    "al.'s whole-batch counts (stable); 'element' = per "
                    "batch element (1/count^2 explodes when a class has "
                    "few pixels in one element — measured here as an "
                    "epoch-level collapse and a dead mid-frequency class)")
    ap.add_argument("--train-size", type=int, default=800)
    ap.add_argument("--eval-size", type=int, default=160)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=9e-4)
    ap.add_argument("--out", default="runs/landcover_convergence.jsonl")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--scene-eval", action="store_true",
                    help="after training, score the BEST state's mean IoU "
                    "over a held-out 1024^2 scene through the tiled "
                    "engine (hann + whole modes) — multiclass scene "
                    "serving parity, the softmax analog of "
                    "solar_convergence --scene-eval")
    args = ap.parse_args(argv)

    model = UNet(
        n_classes=NCLASS, filters=(32, 64, 128, 256), factors=(2, 2, 2, 2),
        head="softmax", dtype=jnp.bfloat16,
    )
    state = create_train_state(
        model, jax.random.key(args.seed), jnp.zeros((1, K, K, NB)),
        tx=optax.adam(args.lr),
    )

    if args.loss == "wcce":
        # mild inverse-frequency weighting: the rare classes (water,
        # wetland, road) get pulled up, as the reference's per-class
        # weight vectors do (utils/model_tools.py:25-40)
        weights = [2.0, 1.0, 1.0, 1.0, 1.0, 2.0, 1.0, 2.0]
        loss_fn = lambda y, p: losses.weighted_categorical_crossentropy(
            y, p, weights, reduce_mean=True)
    else:
        loss_fn = lambda y, p: losses.gen_dice(
            y, p, batch_counts=(args.gdl_counts == "batch"))
    train_step = make_train_step(loss_fn, pred_key="probs",
                                 num_classes=NCLASS)
    eval_step = make_eval_step(loss_fn, pred_key="probs",
                               num_classes=NCLASS)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    log = open(args.out, "a")
    print(f"landcover convergence ({args.loss}): {args.train_size} chips x "
          f"{args.epochs} epochs, batch {args.batch_size}, {NCLASS} classes")
    state, best = run_convergence(
        state, train_step, eval_step, make_chip, args, log,
        extra_record={"loss_name": args.loss,
                      **({"gdl_counts": args.gdl_counts}
                         if args.loss == "gen_dice" else {})},
        num_classes=NCLASS,
        metrics_fn=lambda cm: multiclass_metrics(cm, CLASSES),
        keep_best_state=args.scene_eval,
    )

    scene_miou = None
    if args.scene_eval:
        # multiclass scene serving: one 1024^2 scene tiled from unseen
        # chips through the tiled engine (out_channels=8 softmax maps),
        # argmax -> per-class confusion -> mean IoU per engine mode
        from satellite_computervision_tpu.inference import TiledInferenceEngine

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        predict = lambda chips: model.apply(variables, chips)["probs"]
        g = 4
        tiles = [make_chip("scene", i) for i in range(g * g)]
        scene = np.concatenate(
            [np.concatenate([tiles[r * g + c][0] for c in range(g)], 1)
             for r in range(g)], 0)
        labels = np.argmax(np.concatenate(
            [np.concatenate([tiles[r * g + c][1] for c in range(g)], 1)
             for r in range(g)], 0), -1)

        scene_miou = {}
        for mode, kw in [
            ("hann", dict(blend="hann", index_mode="grid")),
            ("whole", dict(tile_mode="whole", whole_multiple=16)),
        ]:
            eng = TiledInferenceEngine(
                predict, kernel=K, buffer=128, batch_size=8,
                out_channels=NCLASS, **kw)
            probs = np.asarray(eng.predict_scene(jnp.asarray(scene)))
            pred = np.argmax(probs, -1)
            cm = np.zeros((NCLASS, NCLASS), np.float64)
            np.add.at(cm, (labels.reshape(-1), pred.reshape(-1)), 1.0)
            scene_miou[mode] = round(multiclass_metrics(cm)["mean_iou"], 4)
        print("SCENE_EVAL " + json.dumps(scene_miou))
        log.write(json.dumps({"scene_eval_mean_iou": scene_miou,
                              "loss_name": args.loss}) + "\n")
        log.flush()

    summary = {"loss_name": args.loss,
               "final": {k: round(float(v), 4) for k, v in best.items()},
               "config": vars(args)}
    print("SUMMARY " + json.dumps(summary))
    log.write(json.dumps(summary) + "\n")
    log.close()


if __name__ == "__main__":
    main()
