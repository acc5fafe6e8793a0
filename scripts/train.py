#!/usr/bin/env python
"""Config-driven training CLI covering the reference model zoo.

TFRecord workloads (EE exports; solar notebook cells 17-69, parking 16-52):
  python scripts/train.py --config solar --train 'data/train-*.tfrecord' \
      --eval 'data/eval-*.tfrecord' --ckpt runs/solar
  python scripts/train.py --config parking --model deeplab ...

NPY-chip workloads (PC exports; the reference drove these through Keras
Sequence generators, utils/processing.py:456-1184):
  python scripts/train.py --config change --model siamese \
      --before 'chips/before/*.npy' --after 'chips/after/*.npy' \
      --labels 'chips/label/*.npy' --ckpt runs/change
  python scripts/train.py --config timeseries --model convlstm \
      --series 'chips/s2_series/*.npy' --ckpt runs/lstm
  python scripts/train.py --config landcover --model hybrid \
      --unet-source naip='chips/naip/*.npy' --series 'chips/s2_series/*.npy' \
      --labels 'chips/label/*.npy' --ckpt runs/landcover
  python scripts/train.py --config landcover --model hierarchical ...  \
      # same inputs as hybrid; the auxiliary sub head trains on
      # pairwise-coarsened classes
"""

import argparse
import glob
import sys

import jax
import jax.numpy as jnp
import optax

from satellite_computervision_tpu.data import get_eval_dataset, get_training_dataset
from satellite_computervision_tpu.data.pipeline import make_preprocess_fn
from satellite_computervision_tpu.train import (
    CheckpointManager,
    Trainer,
    create_train_state,
    load_checkpoint,
)
from satellite_computervision_tpu.train.config import CONFIGS
from satellite_computervision_tpu.train.zoo import get_family

TFRECORD_FAMILIES = ("unet", "deeplab", "acnn")
NPY_FAMILIES = ("siamese", "convlstm", "lstm_autoencoder", "hybrid", "hierarchical")


def _globs(pattern):
    files = sorted(glob.glob(pattern))
    if not files:
        sys.exit(f"no files match {pattern!r}")
    return files


def _build_npy_dataset(args, cfg, batch):
    """Wire the family's chip dataset (the reference generators' twins,
    data/chip_generators.py) from CLI globs."""
    from satellite_computervision_tpu.data.chip_generators import (
        ChipSource,
        HybridChipDataset,
        LSTMAutoencoderChipDataset,
        LSTMChipDataset,
        SiameseChipDataset,
    )

    # the measured training geometry applies to GENERATOR-fed training
    # only: chip_generators crop at any size from larger source arrays,
    # while serialized TFRecords are fixed at export size (train/config.py
    # train_tile/train_batch; bench.py --probe-traingeo measures the MXU
    # winner — larger tiles lift the shallow levels' lane utilization)
    tile, _ = cfg.training_geometry
    k = (tile, tile)
    if args.model == "siamese":
        if not (args.before and args.after and args.labels):
            sys.exit("siamese needs --before/--after/--labels npy globs")
        return SiameseChipDataset(
            _globs(args.before), _globs(args.after), _globs(args.labels),
            batch_size=batch, unet_dim=k, seed=args.seed,
        )
    if args.model in ("convlstm", "lstm_autoencoder"):
        if not args.series:
            sys.exit(f"{args.model} needs --series npy glob of (T, C, H, W) chips")
        cls = LSTMChipDataset if args.model == "convlstm" else LSTMAutoencoderChipDataset
        return cls(
            _globs(args.series), batch_size=batch,
            dim=(args.series_dim, args.series_dim),
            n_channels=len(cfg.bands), n_timesteps=cfg.n_time, seed=args.seed,
        )
    if args.model in ("hybrid", "hierarchical"):
        if not (args.unet_source and args.series and args.labels):
            sys.exit(f"{args.model} needs --unet-source name=glob, --series and --labels")
        sources = {}
        for spec in args.unet_source:
            name, _, pattern = spec.partition("=")
            if not pattern:
                sys.exit(f"--unet-source wants name=glob, got {spec!r}")
            sources[name] = ChipSource.named(name, _globs(pattern))
        return HybridChipDataset(
            sources=sources,
            s2_series_files=_globs(args.series),
            s1_series_files=_globs(args.series_s1) if args.series_s1 else None,
            lstm_dim=(cfg.n_time, args.series_dim, args.series_dim, len(cfg.bands)),
            label_files=_globs(args.labels),
            batch_size=batch, unet_dim=k, n_classes=cfg.num_classes,
            seed=args.seed,
        )
    sys.exit(f"no npy data plumbing for family {args.model!r}")


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--config", choices=sorted(CONFIGS), default="solar")
    ap.add_argument("--model", choices=TFRECORD_FAMILIES + NPY_FAMILIES, default=None,
                    help="model family (default: the config's); deeplab = "
                    "DeepLab-v3+ResNet50 (BASELINE.json #2)")
    ap.add_argument("--train", help="glob of training TFRecords (tfrecord families)")
    ap.add_argument("--eval", help="glob of eval TFRecords")
    # npy-chip family inputs
    ap.add_argument("--before", help="siamese: glob of before-chip npys")
    ap.add_argument("--after", help="siamese: glob of after-chip npys")
    ap.add_argument("--labels", help="siamese/hybrid: glob of label npys")
    ap.add_argument("--series", help="convlstm/lstm_autoencoder/hybrid: glob of (T,C,H,W) npys")
    ap.add_argument("--series-s1", help="hybrid: optional S1 series glob (divisor -50)")
    ap.add_argument("--series-dim", type=int, default=32,
                    help="spatial side of timeseries chips")
    ap.add_argument("--unet-source", action="append",
                    help="hybrid: repeatable name=glob of unet-input chips")
    ap.add_argument("--ckpt", default="runs/default", help="checkpoint root")
    ap.add_argument("--epochs", type=int)
    ap.add_argument("--batch-size", type=int)
    ap.add_argument("--steps-per-epoch", type=int)
    ap.add_argument("--lr", type=float)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--stage-f16", action="store_true",
                    help="stage TFRecord batches host->device as float16 "
                    "(half the H2D bytes; preprocess casts back to f32 on "
                    "device)")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--s2d", action=argparse.BooleanOptionalAction, default=None,
                    help="unet: space-to-depth stem (default: the config's "
                    "space_to_depth; solar trains S2D from scratch — use "
                    "--no-s2d for reference-weight-compatible checkpoints)")
    ap.add_argument("--bn-momentum", type=float, default=0.9,
                    help="BatchNorm running-stat momentum; the Keras-parity "
                    "0.99 needs thousands of steps before eval stabilizes")
    ap.add_argument("--torch-weights",
                    help="deeplab: warm-start the ResNet backbone from a "
                    "torchvision state_dict .pth (README.md:8's pretrained-"
                    "ResNet DeepLab; models.deeplab.load_torch_resnet_weights "
                    "maps convs AND BN running statistics)")
    ap.add_argument("--resume", action="store_true", help="restore best ckpt + seed best metric")
    ap.add_argument("--orbax", action="store_true",
                    help="checkpoint via orbax (sharded-state capable) instead of msgpack")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    cfg = CONFIGS[args.config]
    args.model = args.model or cfg.family
    family = get_family(args.model)
    # measured training batch first (train/config.py train_batch — the
    # --probe-traingeo winner; works for TFRecords too since batch needs
    # no chip re-cut), then the reference config's batch
    batch = args.batch_size or cfg.train_batch or cfg.batch_size
    epochs = args.epochs or cfg.epochs
    lr = args.lr or cfg.learning_rate
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    # ---- model -----------------------------------------------------------
    kw = {"dtype": dtype}
    if args.model == "unet":
        kw.update(remat=args.remat, bn_momentum=args.bn_momentum)
        if args.s2d is not None:
            kw.update(space_to_depth=args.s2d)
    model = family.build(cfg, **kw)
    if getattr(model, "space_to_depth", False):
        print("space-to-depth stem ON (config default; --no-s2d for "
              "reference-weight-compatible checkpoints)")
    loss_fn, pred_key = family.loss(cfg)

    example = tuple(jnp.asarray(a) for a in family.example_inputs(cfg))
    state = create_train_state(
        model, jax.random.key(args.seed), example[0],
        tx=optax.adam(lr), model_args=example[1:],
    )

    if args.torch_weights:
        if args.model != "deeplab":
            sys.exit("--torch-weights applies to --model deeplab (the "
                     "torchvision ResNet backbone)")
        from satellite_computervision_tpu.models.deeplab import (
            load_torch_resnet_weights,
        )

        p, bs = load_torch_resnet_weights(
            state.params, args.torch_weights, state.batch_stats)
        state = state.replace(params=p, batch_stats=bs)
        print(f"warm-started ResNet backbone from {args.torch_weights}")

    ckpt = CheckpointManager(args.ckpt, backend="orbax" if args.orbax else "msgpack")
    trainer = Trainer(
        state, loss_fn, pred_key=pred_key,
        num_classes=max(cfg.num_classes, 2), monitor=cfg.monitor,
        mode="min" if cfg.monitor == "loss" else "max",
        checkpoint_manager=ckpt, seed=args.seed,
    )

    # ---- data ------------------------------------------------------------
    key = jax.random.key(args.seed + 1)
    if args.model in TFRECORD_FAMILIES:
        if not args.train:
            sys.exit(f"--train tfrecord glob is required for {args.model}")
        bands = list(cfg.bands)
        train_files = _globs(args.train)
        eval_files = sorted(glob.glob(args.eval)) if args.eval else []
        train_it = get_training_dataset(
            train_files, bands + [cfg.response], kernel_size=cfg.kernel_size,
            batch_size=batch, shuffle_buffer=min(cfg.shuffle_buffer, 2048),
            seed=args.seed,
            stage_dtype="float16" if args.stage_f16 else None,
        )
        response_depth = cfg.num_classes if cfg.num_classes > 1 else None
        preprocess = make_preprocess_fn(
            bands, cfg.response, axes=cfg.axes, splits=cfg.splits,
            response_depth=response_depth,
        )

        def train_batches():
            nonlocal key
            for raw in iter(train_it):
                key, sub = jax.random.split(key)
                yield preprocess(raw, sub, train=True)

        def eval_iter():
            nonlocal key
            it = get_eval_dataset(eval_files, bands + [cfg.response],
                                  kernel_size=cfg.kernel_size, batch_size=batch)
            for raw in it:
                key, sub = jax.random.split(key)
                yield preprocess(raw, sub, train=False)

        steps = args.steps_per_epoch or max(1, len(train_files) * 2)
        eval_fn = eval_iter if eval_files else None
    else:
        ds = _build_npy_dataset(args, cfg, batch)
        if len(ds) == 0:
            sys.exit("not enough chips for one batch")

        wrap = None
        if args.model == "hierarchical":
            if cfg.num_classes < 4:
                # with num_classes <= 3 the pairwise coarsening below maps
                # every fine class to sub-class 0 and the auxiliary head
                # trains on a constant label — meaningless supervision
                sys.exit(
                    "--model hierarchical needs num_classes >= 4 (the "
                    "auxiliary head trains on pairwise-merged classes; "
                    "use --config landcover or another multi-class config)"
                )
            # the mid-depth auxiliary head trains on coarsened classes —
            # adjacent fine classes merged pairwise (sub = main // 2); the
            # reference shipped the 3-head builder but no driver or target
            # spec for this head (utils/model_tools.py:1016-1051)
            import numpy as np

            sub = max(2, cfg.num_classes // 2)
            eye = np.eye(sub, dtype=np.float32)

            def wrap(x, y):
                idx = np.argmax(np.asarray(y), -1)
                return x, (np.asarray(y), eye[np.minimum(idx // 2, sub - 1)])

        def train_batches():
            while True:
                for item in ds:
                    # LSTM-AE yields (x, y, weights); trainer takes (x, y)
                    x, y = item[:2] if len(item) == 3 else item
                    yield wrap(x, y) if wrap else (x, y)

        steps = args.steps_per_epoch or len(ds)
        eval_fn = None

    if args.resume:
        restored, meta = load_checkpoint(f"{args.ckpt}/best", trainer.state)
        trainer.state = restored
        if eval_fn is not None:
            seeded = trainer.seed_best_from_eval(eval_fn())
            print(f"resumed at step {int(restored.step)}, "
                  f"best {cfg.monitor}={trainer.best:.4f} ({seeded})")

    trainer.fit(train_batches(), epochs=epochs, steps_per_epoch=steps, eval_fn=eval_fn)
    print(f"done; best {cfg.monitor}={trainer.best}")


if __name__ == "__main__":
    main()
