#!/usr/bin/env python
"""Standalone evaluation: checkpoint + eval TFRecords -> confusion report.

The reference's evaluation story was `m.evaluate` in the notebooks plus
the (commented-out) confusion-matrix tooling at
utils/model_tools.py:1053-1126. This CLI streams eval chips through the
jitted classifier and prints the full report — counts, row-normalized
rates, per-class precision/recall/IoU/F1 — as JSON.

  python scripts/evaluate.py --config solar --ckpt runs/solar \
      --eval 'data/eval-*.tfrecord' [--out report.json]

Published-weights mode (--h5): score a reference-trained Keras model —
e.g. the shipped solar weights (utils/model_tools.py:1204-1269 is the
reference's load path) — directly against eval chips, one command:

  python scripts/evaluate.py --h5 solar_unet.h5 --config solar \
      --eval 'chips/eval-*.tfrecord' [--out report.json]

The U-Net architecture (bands/filters/convs_per_block/classes) is
inferred from the .h5 kernel shapes (train.keras_import.infer_unet_arch),
weights are mapped onto the flax tree (exact forward parity pinned in
tests/test_tf_parity.py), BN is folded for serving, and the same
confusion report is produced. --h5 accepts a local path or https URL.
"""

import argparse
import glob
import json
import os
import sys

import jax
import numpy as np

from satellite_computervision_tpu.data import get_eval_dataset
from satellite_computervision_tpu.data.pipeline import make_preprocess_fn
from satellite_computervision_tpu.train.config import CONFIGS
from satellite_computervision_tpu.train.evaluate import evaluate_confusion

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from predict import load_model  # noqa: E402


def load_h5_model(h5, cfg, fold=True):
    """Reference Keras ``.h5`` (path or URL) -> (flax model, variables),
    ready to serve: arch inferred from kernel shapes, weights mapped,
    BN optionally folded (models/fold.py; numerically identical)."""
    import jax.numpy as jnp

    from satellite_computervision_tpu.models import UNet, fold_unet_variables
    from satellite_computervision_tpu.train.keras_import import (
        infer_unet_arch,
        load_keras_unet_h5,
    )

    if h5.startswith(("http://", "https://")):
        import urllib.request

        with urllib.request.urlopen(h5) as resp:
            h5 = resp.read()
    arch = infer_unet_arch(h5)
    if arch["bands"] != len(cfg.bands):
        print(f"note: h5 expects {arch['bands']} bands; config "
              f"{cfg.name!r} lists {len(cfg.bands)} — the h5 wins")
    model = UNet(
        n_classes=arch["n_classes"],
        filters=arch["filters"],
        factors=arch["factors"],
        convs_per_block=arch["convs_per_block"],
        head="sigmoid" if arch["n_classes"] == 1 else "softmax",
        threshold=cfg.threshold,
        dtype=jnp.bfloat16,
    )
    init = model.init(
        jax.random.key(0),
        jnp.zeros((1, cfg.kernel_size, cfg.kernel_size, arch["bands"])),
    )
    params, stats = load_keras_unet_h5(h5, init["params"], init["batch_stats"])
    variables = {"params": params, "batch_stats": stats}
    if fold:
        model, variables = fold_unet_variables(model, variables)
    print(f"imported h5 U-Net: {arch['bands']} bands, filters "
          f"{arch['filters']}, convs_per_block {arch['convs_per_block']}, "
          f"{arch['n_classes']} classes, fold_bn={fold}")
    return model, variables


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--config", choices=sorted(CONFIGS), default="solar")
    ap.add_argument("--model", default="unet", choices=["unet", "deeplab", "acnn"],
                    help="single-input TFRecord families only (multi-input "
                    "families need npy-chip plumbing; evaluate those via "
                    "the Trainer's eval loop)")
    ap.add_argument("--ckpt", help="framework checkpoint dir (or use --h5)")
    ap.add_argument("--h5", help="reference Keras .h5 weights (path or "
                    "https URL) — architecture inferred, weights imported, "
                    "BN folded, then evaluated like any checkpoint")
    ap.add_argument("--family", default="unet", choices=["unet"],
                    help="--h5 model family (reference U-Nets; other "
                    "families import via compat.get_blob_model)")
    ap.add_argument("--no-fold", action="store_true",
                    help="--h5: serve live eval-mode BN instead of the "
                    "folded program (numerically identical; for debugging)")
    ap.add_argument("--eval", required=True, help="glob of eval TFRecords")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--class-names", nargs="*", default=None)
    ap.add_argument("--out", help="also write the JSON report here")
    args = ap.parse_args(argv)

    cfg = CONFIGS[args.config]
    files = sorted(glob.glob(args.eval))
    if not files:
        sys.exit(f"no files match {args.eval!r}")

    if args.h5:
        model, variables = load_h5_model(
            args.h5, cfg, fold=not args.no_fold)
    elif args.ckpt:
        model, variables = load_model(cfg, args.ckpt, arch=args.model)
    else:
        sys.exit("one of --ckpt / --h5 is required")
    bands = list(cfg.bands)
    response_depth = cfg.num_classes if cfg.num_classes > 1 else None
    preprocess = make_preprocess_fn(
        bands, cfg.response, axes=cfg.axes, splits=cfg.splits,
        response_depth=response_depth, augment=False,
    )
    it = get_eval_dataset(files, bands + [cfg.response],
                          kernel_size=cfg.kernel_size, batch_size=args.batch_size)
    key = jax.random.key(0)

    def batches():
        for raw in it:
            yield preprocess(raw, key, train=False)

    n_eval = max(cfg.num_classes, 2)

    def predict_classes(x):
        out = model.apply(variables, x)
        y_hat = out["classes"] if isinstance(out, dict) else out
        return y_hat[..., 0] if y_hat.ndim == 4 else y_hat

    report = evaluate_confusion(
        predict_classes, batches(), n_eval, class_names=args.class_names
    )
    text = json.dumps(
        report, indent=2,
        default=lambda o: o.tolist() if hasattr(o, "tolist") else float(o),
    )
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)


if __name__ == "__main__":
    main()
