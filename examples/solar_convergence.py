#!/usr/bin/env python
"""Solar-config convergence run: the quality-parity evidence harness.

BASELINE.md's quality target is the reference's solar IoU/F1 under its real
config (7,700 train / 3,300 eval 256^2 chips, batch 16, 20 epochs, Adam
9e-4, weighted BCE, checkpoint on val MeanIoU — solar notebook cell 17).
The actual Sentinel-2 chips are cloud exports this environment cannot fetch
(zero egress), so this harness trains the FULL solar U-Net (32..512
filters, sigmoid head) under that exact optimization config on procedurally
generated chips calibrated to S2 L2A statistics:

- 6 bands (B2, B3, B4, B8, B11, B12) as DNs/10000 reflectance;
- spatially correlated background (upsampled low-frequency noise) mixing
  vegetation (high B8, moderate SWIR) and soil/urban signatures;
- solar farms: axis-aligned panel-row blocks with the PV signature (low
  NIR/SWIR, weakly blue-tilted visible), present in ~60% of chips;
- confusers: water bodies (dark in every band) and dark roads, which share
  the "dark in NIR" trait that makes solar mapping hard.

Chips are a pure function of (split, index), so the "dataset" needs no
disk and the train/eval split is exact. Metrics per epoch: loss, accuracy,
IoU(solar) and F1 at the reference's 0.9 threshold (utils/
model_tools.py:444-445). Writes JSONL history + a final summary line.

Usage (full run ~= 25 min on the tunnel v5e at --train-size 1540):
  python examples/solar_convergence.py --train-size 1540 --eval-size 330 \
      --epochs 20 --out runs/solar_convergence.jsonl
  python examples/solar_convergence.py ... --space-to-depth   # S2D variant
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

import numpy as np

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from convergence_common import (  # noqa: E402
    binary_metrics,  # noqa: F401  (re-export for external users)
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

BANDS = 6  # B2, B3, B4, B8, B11, B12
K = 256

# per-band (background-mix, vegetation, panel, water) mean DNs/1e4,
# loosely matching S2 L2A surface-reflectance statistics
VEG = np.array([0.031, 0.055, 0.034, 0.345, 0.176, 0.085], np.float32)
SOIL = np.array([0.110, 0.140, 0.180, 0.270, 0.320, 0.270], np.float32)
PANEL = np.array([0.060, 0.065, 0.060, 0.085, 0.100, 0.080], np.float32)
WATER = np.array([0.045, 0.050, 0.040, 0.020, 0.010, 0.008], np.float32)


def make_chip(split: str, index: int, k: int = K):
    """Deterministic (features (k,k,6) refl, label (k,k,1)) for an index.

    Seeds are process-stable (convergence_common.stable_seed). ``k`` is
    the tile side — the probe-measured large-tile training geometry
    (bench.py --probe-traingeo) trains on the same distribution at 512^2
    via --tile; feature/structure scales are in pixels either way, so a
    512^2 chip is "more landscape", not rescaled content."""
    rng = np.random.default_rng(stable_seed(split, index))

    veg_frac = 0.5 + 0.5 * smooth_field(rng, k)  # spatially correlated mix
    veg_frac = np.clip(veg_frac, 0.0, 1.0)[..., None]
    chip = veg_frac * VEG + (1 - veg_frac) * SOIL

    label = np.zeros((k, k), np.float32)

    # water confuser (30% of chips): dark blob
    if rng.random() < 0.3:
        cy, cx = rng.integers(30, k - 30, 2)
        r = rng.integers(12, 40)
        yy, xx = np.ogrid[:k, :k]
        blob = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
        chip[blob] = WATER * rng.uniform(0.8, 1.2)

    # dark road confuser (40%)
    if rng.random() < 0.4:
        w = rng.integers(2, 5)
        pos = rng.integers(0, k - w)
        dark = PANEL * rng.uniform(0.9, 1.1) * np.array([1, 1, 1.2, 1.3, 1.5, 1.4], np.float32)
        if rng.random() < 0.5:
            chip[pos : pos + w, :] = dark
        else:
            chip[:, pos : pos + w] = dark

    # solar farm (60%): block of panel rows with row-gap striping
    if rng.random() < 0.6:
        fh = int(rng.integers(24, 96))
        fw = int(rng.integers(24, 96))
        fy = int(rng.integers(4, k - fh - 4))
        fx = int(rng.integers(4, k - fw - 4))
        farm = np.tile(PANEL, (fh, fw, 1)) * rng.uniform(0.9, 1.1)
        # panel-row striping: every 4th row line shows ground between rows
        stripe = (np.arange(fh) % 4 == 3)[:, None, None]
        ground = veg_frac[fy : fy + fh, fx : fx + fw] * VEG + (
            1 - veg_frac[fy : fy + fh, fx : fx + fw]
        ) * SOIL
        chip[fy : fy + fh, fx : fx + fw] = np.where(stripe, ground, farm)
        label[fy : fy + fh, fx : fx + fw] = 1.0

    chip = chip + rng.normal(0, 0.008, chip.shape).astype(np.float32)
    # float16 features / uint8 labels: half the H2D bytes on the relay
    # link (the training bottleneck here); the model computes in bfloat16
    # regardless, so nothing is lost
    return np.clip(chip, 0, 1).astype(np.float16), label[..., None].astype(np.uint8)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train-size", type=int, default=1540)
    ap.add_argument("--eval-size", type=int, default=330)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=9e-4)
    ap.add_argument("--pos-weight", type=float, default=2.0)
    ap.add_argument("--threshold", type=float, default=0.9)
    ap.add_argument("--bn-momentum", type=float, default=0.9)
    ap.add_argument("--tile", type=int, default=K,
                    help="training tile side (default 256 = the reference "
                    "chip export; 512 = the probe-measured MXU-efficient "
                    "geometry, bench.py --probe-traingeo)")
    ap.add_argument("--space-to-depth", action="store_true")
    ap.add_argument("--out", default="runs/solar_convergence.jsonl")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--scene-eval", action="store_true",
                    help="after training, score full-scene inference modes "
                    "(chips / hann / whole) on a 4x4-chip eval scene")
    args = ap.parse_args(argv)

    model = UNet(
        n_classes=1,
        filters=(32, 64, 128, 256, 512),
        factors=(2, 2, 2, 2, 2),
        head="sigmoid",
        threshold=args.threshold,
        bn_momentum=args.bn_momentum,
        space_to_depth=args.space_to_depth,
        dtype=jnp.bfloat16,
    )
    state = create_train_state(
        model, jax.random.key(args.seed),
        jnp.zeros((1, args.tile, args.tile, BANDS)),
        tx=optax.adam(args.lr),
    )
    loss_fn = lambda y, p: losses.weighted_bce(y, p, pos_weight=args.pos_weight, logits=True)
    train_step = make_train_step(loss_fn, pred_key="logits", num_classes=2)
    eval_step = make_eval_step(loss_fn, pred_key="logits", num_classes=2)

    import os

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    log = open(args.out, "a")

    print(f"solar convergence: {args.train_size} chips x {args.epochs} epochs, "
          f"batch {args.batch_size}, tile {args.tile}, "
          f"space_to_depth={args.space_to_depth}")
    chip_fn = (make_chip if args.tile == K
               else lambda split, index: make_chip(split, index, k=args.tile))
    state, best = run_convergence(
        state, train_step, eval_step, chip_fn, args, log,
        extra_record={"space_to_depth": args.space_to_depth,
                      "tile": args.tile},
    )

    if args.scene_eval:
        # full-scene inference quality on the trained model: the three
        # engine modes over one 1024^2 scene tiled from unseen eval chips
        from satellite_computervision_tpu.inference import TiledInferenceEngine

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        predict = lambda chips: model.apply(variables, chips)["probs"]
        g = 4
        pairs = [make_chip("scene", i) for i in range(g * g)]
        scene = np.concatenate(
            [np.concatenate([pairs[r * g + c][0] for c in range(g)], 1) for r in range(g)], 0
        )
        labels = np.concatenate(
            [np.concatenate([pairs[r * g + c][1] for c in range(g)], 1) for r in range(g)], 0
        )[..., 0].astype(bool)

        scene_iou = {}
        for mode, kw in [
            ("chips", dict(blend="overwrite", index_mode="grid")),
            ("hann", dict(blend="hann", index_mode="grid")),
            # S2D folds 2x2 before the 5-level trunk -> total downsample 64
            ("whole", dict(tile_mode="whole",
                           whole_multiple=64 if args.space_to_depth else 32)),
        ]:
            eng = TiledInferenceEngine(
                predict, kernel=K, buffer=128, batch_size=8, out_channels=1, **kw
            )
            prob = np.asarray(eng.predict_scene(jnp.asarray(scene)))[..., 0]
            pred = prob >= args.threshold
            tp = int((pred & labels).sum())
            fp = int((pred & ~labels).sum())
            fn = int((~pred & labels).sum())
            scene_iou[mode] = round(tp / max(tp + fp + fn, 1), 4)
        print("SCENE_EVAL " + json.dumps(scene_iou))
        log.write(json.dumps({"scene_eval_iou": scene_iou}) + "\n")
        log.flush()

    summary = {"final": {k: round(float(v), 4) for k, v in best.items()},
               "config": vars(args)}
    print("SUMMARY " + json.dumps(summary))
    log.write(json.dumps(summary) + "\n")
    log.close()


if __name__ == "__main__":
    main()
