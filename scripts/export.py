#!/usr/bin/env python
"""Export a trained U-Net checkpoint as a reference-layout Keras ``.h5``.

The reference ecosystem's model-artifact channel is Keras
``save_weights`` HDF5 (shared over Azure blob storage,
utils/model_tools.py:1178-1269). ``scripts/export.py`` is the hand-back
direction of that bridge: restore ``<ckpt>/best``, write the weights in
the exact layout the reference's builders produce, so colleagues still
on the TF/Keras stack can ``model.load_weights()`` the file — and
``train.keras_import`` / ``scripts/evaluate.py --h5`` read it back here.

  python scripts/export.py --config solar --ckpt runs/solar --out solar.h5

Only the plain-stem U-Net family maps onto the reference architecture
(utils/model_tools.py:321-531). Space-to-depth checkpoints are a
TPU-native variant with no Keras equivalent and are rejected — train
with ``--no-s2d`` to produce exportable weights. For blob upload, use
``train.keras_export.export_keras_unet_h5_bytes`` with ``cloud.blob``.
"""

import argparse
import os
import sys

from satellite_computervision_tpu.train.config import CONFIGS
from satellite_computervision_tpu.train.keras_export import export_keras_unet_h5
from satellite_computervision_tpu.train.keras_import import infer_unet_arch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from predict import load_model  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    ap.add_argument("--config", choices=sorted(CONFIGS), default="solar")
    ap.add_argument("--ckpt", required=True,
                    help="checkpoint dir (restores <ckpt>/best)")
    ap.add_argument("--out", required=True, help="output .h5 path")
    args = ap.parse_args(argv)
    cfg = CONFIGS[args.config]

    model, variables = load_model(cfg, args.ckpt, bf16=False)
    export_keras_unet_h5(
        variables["params"], variables["batch_stats"], args.out
    )
    arch = infer_unet_arch(args.out)
    print(
        f"wrote {args.out}: {arch['bands']} bands, filters {arch['filters']},"
        f" convs_per_block {arch['convs_per_block']}, "
        f"{arch['n_classes']} classes "
        f"({os.path.getsize(args.out) / 1e6:.1f} MB)"
    )


if __name__ == "__main__":
    main()
