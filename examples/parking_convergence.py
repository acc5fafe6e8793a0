"""Parking-lot convergence under the reference's full optimization config.

The parking notebook (cells 16-52) trains on NAIP RGB 512^2 chips with
weighted BCE pos_weight=20 and reports "50 epochs. 25 hours. Final RMSE
~0.08" on a Colab-era VM. Real NAIP chips are cloud exports this
environment cannot fetch (zero egress), so — like
examples/solar_convergence.py — this trains the full model under the
reference's exact optimization config on procedurally generated chips
calibrated to 1 m/px NAIP statistics: gray asphalt parking lots with
white stall striping, and road / building-roof confusers that share the
"paved gray rectangle" trait.

Runs either the notebook's plain U-Net or the README-promised
DeepLab-v3+ResNet (README.md:8) via --model. Appends one JSON line per
epoch to --out; committed history: runs/parking_convergence.jsonl.
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
    run_convergence,
    smooth_field,
    stable_seed,
)
from satellite_computervision_tpu.models import UNet, DeepLabV3Plus, losses  # noqa: E402
from satellite_computervision_tpu.train import create_train_state  # noqa: E402
from satellite_computervision_tpu.train.trainer import (  # noqa: E402
    make_eval_step,
    make_train_step,
)
from satellite_computervision_tpu.data.pipeline import prefetch_to_device  # noqa: E402

K = 512  # parking notebook kernel (cell 16)

# mean RGB reflectance (0-1) of the scene materials at NAIP 1 m/px
GRASS = np.array([0.25, 0.35, 0.18], np.float32)
SOIL = np.array([0.45, 0.40, 0.33], np.float32)
ASPHALT = np.array([0.34, 0.34, 0.35], np.float32)
ROOF = np.array([0.55, 0.52, 0.50], np.float32)
STRIPE = np.array([0.85, 0.85, 0.85], np.float32)


def _paved_rect(rng, max_side):
    h = int(rng.integers(30, max_side))
    w = int(rng.integers(40, max_side))
    y = int(rng.integers(2, K - h - 2))
    x = int(rng.integers(2, K - w - 2))
    return y, x, h, w


def make_chip(split: str, index: int):
    """Deterministic (chip (K,K,3) float16, label (K,K,1) uint8)."""
    rng = np.random.default_rng(stable_seed(split, index, stride=2_000_003))

    green = np.clip(0.5 + 0.5 * smooth_field(rng, K, scale=32), 0, 1)[..., None]
    chip = green * GRASS + (1 - green) * SOIL
    label = np.zeros((K, K), np.float32)

    # roads (60%): long thin asphalt strips WITHOUT stall striping
    for _ in range(rng.integers(0, 3)):
        w = int(rng.integers(6, 14))
        pos = int(rng.integers(0, K - w))
        tone = ASPHALT * rng.uniform(0.9, 1.1)
        if rng.random() < 0.5:
            chip[pos : pos + w, :] = tone
        else:
            chip[:, pos : pos + w] = tone

    # building roofs (50%): bright rectangles
    if rng.random() < 0.5:
        y, x, h, w = _paved_rect(rng, 120)
        chip[y : y + h, x : x + w] = ROOF * rng.uniform(0.9, 1.1)

    # parking lots (60%): asphalt rectangles WITH white stall stripes
    if rng.random() < 0.6:
        for _ in range(int(rng.integers(1, 3))):
            y, x, h, w = _paved_rect(rng, 180)
            lot = np.tile(ASPHALT * rng.uniform(0.92, 1.08), (h, w, 1))
            # stall striping: thin bright lines every ~6 px (stalls ~3 m)
            pitch = int(rng.integers(5, 8))
            stripes = (np.arange(w) % pitch == 0)[None, :, None]
            lot = np.where(stripes, STRIPE * rng.uniform(0.9, 1.0), lot)
            # lane gap through the middle
            lane = slice(h // 2 - 3, h // 2 + 3)
            lot[lane] = ASPHALT * rng.uniform(0.92, 1.08)
            chip[y : y + h, x : x + w] = lot
            label[y : y + h, x : x + w] = 1.0

    chip = chip + rng.normal(0, 0.01, chip.shape).astype(np.float32)
    return np.clip(chip, 0, 1).astype(np.float16), label[..., None].astype(np.uint8)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", choices=["unet", "deeplab"], default="unet")
    ap.add_argument("--train-size", type=int, default=800)
    ap.add_argument("--eval-size", type=int, default=160)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=9e-4)
    ap.add_argument("--pos-weight", type=float, default=20.0)  # parking nb cell 39
    ap.add_argument("--out", default="runs/parking_convergence.jsonl")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--torch-weights",
                    help="deeplab only: warm-start the ResNet backbone from "
                    "a torchvision-layout state_dict .pth (README.md:8's "
                    "pretrained backbone; scripts/train.py --torch-weights "
                    "is the production path, this flag makes the warm-vs-"
                    "cold comparison reproducible in one harness)")
    ap.add_argument("--export-backbone",
                    help="deeplab only: after training, write the backbone "
                    "as a torchvision-layout .pth (models.deeplab."
                    "export_torch_resnet_weights) — the pretrain half of "
                    "the warm-start rehearsal")
    args = ap.parse_args(argv)

    if args.model == "deeplab":
        model = DeepLabV3Plus(n_classes=1, head="sigmoid", dtype=jnp.bfloat16)
    else:
        model = UNet(
            n_classes=1, filters=(32, 64, 128, 256, 512), factors=(2,) * 5,
            head="sigmoid", bn_momentum=0.9, dtype=jnp.bfloat16, remat=True,
        )
    state = create_train_state(
        model, jax.random.key(args.seed), jnp.zeros((1, K, K, 3)),
        tx=optax.adam(args.lr),
    )
    if args.torch_weights or args.export_backbone:
        if args.model != "deeplab":
            raise SystemExit("--torch-weights/--export-backbone apply to "
                             "--model deeplab (the ResNet backbone)")
    if args.torch_weights:
        from satellite_computervision_tpu.models.deeplab import (
            load_torch_resnet_weights,
        )
        p, bs = load_torch_resnet_weights(
            jax.device_get(state.params), args.torch_weights,
            jax.device_get(state.batch_stats))
        state = state.replace(params=p, batch_stats=bs)
        print(f"warm-started ResNet backbone from {args.torch_weights}")
    loss_fn = lambda y, p: losses.weighted_bce(y, p, pos_weight=args.pos_weight, logits=True)
    train_step = make_train_step(loss_fn, pred_key="logits", num_classes=2)
    eval_step = make_eval_step(loss_fn, pred_key="logits", num_classes=2)

    import os

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    log = open(args.out, "a")

    print(f"parking convergence ({args.model}): {args.train_size} chips x "
          f"{args.epochs} epochs, batch {args.batch_size}, pos_weight {args.pos_weight}")
    state, best = run_convergence(
        state, train_step, eval_step, make_chip, args, log,
        extra_record={"model": args.model,
                      "warm_start": bool(args.torch_weights)},
    )

    if args.export_backbone:
        from satellite_computervision_tpu.models.deeplab import (
            export_torch_resnet_weights,
        )
        export_torch_resnet_weights(
            jax.device_get(state.params), jax.device_get(state.batch_stats),
            args.export_backbone)
        print(f"exported backbone state_dict to {args.export_backbone}")

    summary = {"final": {k: round(float(v), 4) for k, v in best.items()},
               "config": vars(args)}
    print("SUMMARY " + json.dumps(summary))
    log.write(json.dumps(summary) + "\n")
    log.close()


if __name__ == "__main__":
    main()
