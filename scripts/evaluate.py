#!/usr/bin/env python
"""Standalone evaluation: checkpoint + eval TFRecords -> confusion report.

The reference's evaluation story was `m.evaluate` in the notebooks plus
the (commented-out) confusion-matrix tooling at
utils/model_tools.py:1053-1126. This CLI streams eval chips through the
jitted classifier and prints the full report — counts, row-normalized
rates, per-class precision/recall/IoU/F1 — as JSON.

  python scripts/evaluate.py --config solar --ckpt runs/solar \
      --eval 'data/eval-*.tfrecord' [--out report.json]
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


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--config", choices=sorted(CONFIGS), default="solar")
    ap.add_argument("--model", default="unet", choices=["unet", "deeplab", "acnn"],
                    help="single-input TFRecord families only (multi-input "
                    "families need npy-chip plumbing; evaluate those via "
                    "the Trainer's eval loop)")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--eval", required=True, help="glob of eval TFRecords")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--class-names", nargs="*", default=None)
    ap.add_argument("--out", help="also write the JSON report here")
    args = ap.parse_args(argv)

    cfg = CONFIGS[args.config]
    files = sorted(glob.glob(args.eval))
    if not files:
        sys.exit(f"no files match {args.eval!r}")

    model, variables = load_model(cfg, args.ckpt, arch=args.model)
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
