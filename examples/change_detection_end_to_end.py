#!/usr/bin/env python
"""Change detection end-to-end: the run_local workflow without the cloud.

Mirrors the reference's Planetary-Computer change-detection story
(utils/pc_tools.py:620-668 + utils/model_tools.py:576-663): before/after
Sentinel-2 item sets -> NaN-median composites -> per-pixel normalization ->
8-band concat -> Siamese U-Net -> full-scene tiled change probabilities ->
GeoTIFF. Every stage is this framework's own: cloud.compositing for the
array math, train for the short demo fit, inference for the scene pass,
geo for the export. Synthetic items stand in for STAC assets (no egress).
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
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from satellite_computervision_tpu.cloud.compositing import change_pair_composite  # noqa: E402
from satellite_computervision_tpu.geo import read_geotiff, write_geotiff  # noqa: E402
from satellite_computervision_tpu.inference import TiledInferenceEngine  # noqa: E402
from satellite_computervision_tpu.models import SiameseUNet, losses  # noqa: E402
from satellite_computervision_tpu.train import create_train_state  # noqa: E402
from satellite_computervision_tpu.train.trainer import make_train_step  # noqa: E402

BANDS = ("B02", "B03", "B04", "B08")


def synth_items(rng, h, w, n_items, date, farms):
    """Item set for one period; ``farms`` = [(y, x, side)] built-up areas."""
    items = []
    for _ in range(n_items):
        bands = {}
        veg = rng.uniform(0.4, 0.6)
        base = {
            "B02": 400 * veg + 900 * (1 - veg),
            "B03": 600 * veg + 1100 * (1 - veg),
            "B04": 400 * veg + 1400 * (1 - veg),
            "B08": 3200 * veg + 2400 * (1 - veg),
        }
        for b in BANDS:
            arr = np.full((h, w), base[b], np.float32)
            arr += rng.normal(0, 60, (h, w)).astype(np.float32)
            bands[b] = arr
        for (fy, fx, side) in farms:
            # built-up: bright visible, low NIR
            sig = {"B02": 1600.0, "B03": 1700.0, "B04": 1900.0, "B08": 1500.0}
            for b in BANDS:
                bands[b][fy : fy + side, fx : fx + side] = sig[b] + rng.normal(
                    0, 40, (side, side)
                )
        # random cloud-masked (nodata) patch per item
        cy, cx = rng.integers(0, h - 24), rng.integers(0, w - 24)
        for b in BANDS:
            bands[b][cy : cy + 24, cx : cx + 24] = 0.0
        items.append({"datetime": date, "bands": bands})
    return items


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene", type=int, default=192)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--kernel", type=int, default=64)
    ap.add_argument("--buffer", type=int, default=32)
    args = ap.parse_args(argv)

    rng = np.random.default_rng(0)
    h = w = args.scene

    # --- training chips: pairs with/without change --------------------------
    model = SiameseUNet(filters=(8, 16), factors=(2, 2), threshold=0.5)
    k = args.kernel + args.buffer
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, k, k, len(BANDS))),
        tx=optax.adam(1e-3), model_args=(jnp.zeros((1, k, k, len(BANDS))),),
    )
    loss_fn = lambda y, p: losses.weighted_bce(y, p, pos_weight=3.0, logits=True)
    step = make_train_step(loss_fn, pred_key="logits", num_classes=2)

    def training_batch(batch=8):
        xs_b, xs_a, ys = [], [], []
        for _ in range(batch):
            farms_before = []
            farms_after = []
            label = np.zeros((k, k, 1), np.float32)
            if rng.random() < 0.7:  # new construction = change
                fy, fx, side = rng.integers(8, k - 40), rng.integers(8, k - 40), 24
                farms_after.append((fy, fx, side))
                label[fy : fy + side, fx : fx + side] = 1.0
            if rng.random() < 0.4:  # pre-existing structure = no change
                fy, fx = rng.integers(8, k - 40, 2)
                farms_before.append((fy, fx, 16))
                farms_after.append((fy, fx, 16))
            before = synth_items(rng, k, k, 3, "2021-06-01", farms_before)
            after = synth_items(rng, k, k, 3, "2022-06-01", farms_after)
            pair = change_pair_composite(before, after, BANDS)
            xs_b.append(pair[..., : len(BANDS)])
            xs_a.append(pair[..., len(BANDS) :])
            ys.append(label)
        return (
            (jnp.asarray(np.stack(xs_b)), jnp.asarray(np.stack(xs_a))),
            jnp.asarray(np.stack(ys)),
        )

    key = jax.random.key(1)
    t0 = time.time()
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        state, out = step(state, training_batch(), sub)
        if i % 10 == 0:
            print(f"step {i}: loss={float(out['loss']):.4f}")
    print(f"trained {args.steps} steps in {time.time() - t0:.1f}s")

    # --- full-scene pass: composite -> tiled siamese inference --------------
    farms_after = [(h // 3, w // 3, 28)]
    before_items = synth_items(rng, h, w, 4, "2021-06-01", [])
    after_items = synth_items(rng, h, w, 4, "2022-06-01", farms_after)
    scene = change_pair_composite(before_items, after_items, BANDS)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    nb = len(BANDS)
    predict = lambda chips: model.apply(
        variables, chips[..., :nb], chips[..., nb:]
    )["probs"]
    engine = TiledInferenceEngine(
        predict, kernel=args.kernel, buffer=args.buffer, batch_size=8,
        out_channels=1,
    )
    pred = np.asarray(engine.predict_scene(scene))

    fy, fx = h // 3, w // 3
    mask = np.zeros((h, w), bool)
    mask[fy : fy + 28, fx : fx + 28] = True
    inside = float(pred[..., 0][mask].mean())
    outside = float(pred[..., 0][~mask].mean())
    print(json.dumps({"mean_prob_change": round(inside, 3),
                      "mean_prob_background": round(outside, 3)}))

    out_tif = tempfile.mktemp(suffix="_change.tif")
    write_geotiff(
        out_tif, pred, transform=(10.0, 0.0, 500000.0, 0.0, -10.0, 3900000.0),
        crs="EPSG:32617",
    )
    back, meta = read_geotiff(out_tif)
    print(f"geotiff: {out_tif} shape={back.shape} crs={meta['crs']}")
    assert inside > outside, "change probability should peak on new construction"
    print("OK")


if __name__ == "__main__":
    main()
