#!/usr/bin/env python
"""Config-driven training CLI — the reference notebooks' training cells as
a command (solar notebook cells 17-69 / parking cells 16-52).

Examples:
  python scripts/train.py --config solar --train 'data/train-*.tfrecord' \
      --eval 'data/eval-*.tfrecord' --ckpt runs/solar
  python scripts/train.py --config parking --epochs 5 --batch-size 8 \
      --train 'chips/*.tfrecord' --ckpt runs/parking --resume
"""

import argparse
import glob
import sys

import jax
import jax.numpy as jnp
import optax

from satellite_computervision_tpu.data import get_eval_dataset, get_training_dataset
from satellite_computervision_tpu.data.pipeline import make_preprocess_fn
from satellite_computervision_tpu.models import DeepLabV3Plus, UNet, losses
from satellite_computervision_tpu.train import (
    CheckpointManager,
    Trainer,
    create_train_state,
    load_checkpoint,
)
from satellite_computervision_tpu.train.config import PARKING_CONFIG, SOLAR_CONFIG

CONFIGS = {"solar": SOLAR_CONFIG, "parking": PARKING_CONFIG}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", choices=sorted(CONFIGS), default="solar")
    ap.add_argument("--model", choices=["unet", "deeplab"], default="unet",
                    help="deeplab = DeepLab-v3+ResNet50 (the parking-lot "
                    "config of BASELINE.json #2)")
    ap.add_argument("--train", required=True, help="glob of training TFRecords")
    ap.add_argument("--eval", help="glob of eval TFRecords")
    ap.add_argument("--ckpt", default="runs/default", help="checkpoint root")
    ap.add_argument("--epochs", type=int)
    ap.add_argument("--batch-size", type=int)
    ap.add_argument("--steps-per-epoch", type=int)
    ap.add_argument("--lr", type=float)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--bn-momentum", type=float, default=0.9,
                    help="BatchNorm running-stat momentum; the Keras-parity "
                    "0.99 needs thousands of steps before eval stabilizes")
    ap.add_argument("--resume", action="store_true", help="restore best ckpt + seed best metric")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    cfg = CONFIGS[args.config]
    batch = args.batch_size or cfg.batch_size
    epochs = args.epochs or cfg.epochs
    lr = args.lr or cfg.learning_rate
    bands = list(cfg.bands)

    train_files = sorted(glob.glob(args.train))
    if not train_files:
        sys.exit(f"no files match {args.train!r}")
    eval_files = sorted(glob.glob(args.eval)) if args.eval else []

    train_it = get_training_dataset(
        train_files, bands + [cfg.response], kernel_size=cfg.kernel_size,
        batch_size=batch, shuffle_buffer=min(cfg.shuffle_buffer, 2048), seed=args.seed,
    )
    preprocess = make_preprocess_fn(bands, cfg.response, axes=cfg.axes, splits=cfg.splits)

    head = "sigmoid" if cfg.num_classes == 1 else "softmax"
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.model == "deeplab":
        model = DeepLabV3Plus(
            n_classes=cfg.num_classes, head=head, threshold=cfg.threshold, dtype=dtype
        )
    else:
        model = UNet(
            n_classes=cfg.num_classes, head=head, threshold=cfg.threshold,
            remat=args.remat, bn_momentum=args.bn_momentum, dtype=dtype,
        )
    state = create_train_state(
        model, jax.random.key(args.seed),
        jnp.zeros((1, cfg.kernel_size, cfg.kernel_size, len(bands))),
        tx=optax.adam(lr),
    )
    loss_fn = losses.make_loss(cfg.loss, **cfg.loss_kwargs)
    if cfg.loss == "weighted_bce":
        loss_fn = lambda t, p: losses.weighted_bce(t, p, logits=True, **cfg.loss_kwargs)

    ckpt = CheckpointManager(args.ckpt)
    trainer = Trainer(
        state, loss_fn, pred_key="logits",
        num_classes=max(cfg.num_classes, 2), monitor=cfg.monitor,
        checkpoint_manager=ckpt, seed=args.seed,
    )

    key = jax.random.key(args.seed + 1)

    def preprocessed(iterator):
        nonlocal key
        for raw in iterator:
            key, sub = jax.random.split(key)
            yield preprocess(raw, sub, train=True)

    def eval_iter():
        nonlocal key
        it = get_eval_dataset(eval_files, bands + [cfg.response],
                              kernel_size=cfg.kernel_size, batch_size=batch)
        for raw in it:
            key, sub = jax.random.split(key)
            yield preprocess(raw, sub, train=False)

    if args.resume:
        restored, meta = load_checkpoint(f"{args.ckpt}/best", trainer.state)
        trainer.state = restored
        if eval_files:
            seeded = trainer.seed_best_from_eval(eval_iter())
            print(f"resumed at step {int(restored.step)}, best {cfg.monitor}={trainer.best:.4f} ({seeded})")

    steps = args.steps_per_epoch or max(1, len(train_files) * 2)
    trainer.fit(
        preprocessed(iter(train_it)), epochs=epochs, steps_per_epoch=steps,
        eval_fn=eval_iter if eval_files else None,
    )
    print(f"done; best {cfg.monitor}={trainer.best}")


if __name__ == "__main__":
    main()
