"""End-to-end demo: the solar-array workflow on synthetic data.

Mirrors the reference solar notebook's pipeline (SURVEY.md §3.1 + §3.3)
without cloud APIs: synthesize EE-schema TFRecord chips, train the binary
U-Net with weighted BCE, evaluate IoU, run tiled full-scene inference, and
export a georeferenced GeoTIFF. Runs on CPU or a real TPU chip.

Usage: python examples/solar_end_to_end.py [--steps N] [--outdir DIR]
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
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from satellite_computervision_tpu.data import get_training_dataset, write_tfrecord_file
from satellite_computervision_tpu.data.pipeline import make_preprocess_fn
from satellite_computervision_tpu.geo import read_geotiff, write_geotiff
from satellite_computervision_tpu.inference import TiledInferenceEngine
from satellite_computervision_tpu.models import UNet, losses, metrics
from satellite_computervision_tpu.train import Trainer, create_train_state

BANDS = ["B2", "B3", "B4", "B8"]
KERNEL = 64  # small demo chips; the real config uses 256 (SOLAR_CONFIG)


def synthesize_chips(path, n=64, seed=0):
    """Fake Sentinel-2 chips: bright square 'solar arrays' on noise."""
    rng = np.random.default_rng(seed)
    examples = []
    for _ in range(n):
        bands = {b: rng.uniform(0.05, 0.3, (KERNEL, KERNEL)).astype(np.float32) for b in BANDS}
        label = np.zeros((KERNEL, KERNEL), np.float32)
        for _ in range(rng.integers(1, 4)):
            y, x = rng.integers(4, KERNEL - 20, 2)
            h, w = rng.integers(8, 16, 2)
            label[y : y + h, x : x + w] = 1.0
            for b in BANDS:
                bands[b][y : y + h, x : x + w] += 0.5
        ex = {k: v.reshape(-1) for k, v in bands.items()}
        ex["landcover"] = label.reshape(-1)
        examples.append(ex)
    write_tfrecord_file(path, examples)
    return examples


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--outdir", default=None)
    args = ap.parse_args()
    outdir = args.outdir or tempfile.mkdtemp(prefix="scv_demo_")
    os.makedirs(outdir, exist_ok=True)

    print(f"jax backend: {jax.default_backend()}, devices: {len(jax.devices())}")

    # 1. data: EE-schema TFRecords -> device batches with fused preprocess
    tfr = os.path.join(outdir, "train.tfrecord")
    synthesize_chips(tfr, n=64)
    ds = get_training_dataset([tfr], BANDS + ["landcover"], kernel_size=KERNEL,
                              batch_size=8, shuffle_buffer=64)
    preprocess = make_preprocess_fn(BANDS, "landcover", axes=(0, 1))

    # 2. model + train state (binary U-Net, weighted BCE — solar config)
    model = UNet(n_classes=1, filters=(8, 16), factors=(2, 2), head="sigmoid", threshold=0.9)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, KERNEL, KERNEL, len(BANDS))),
        tx=optax.adam(1e-3),
    )
    loss_fn = lambda y, p: losses.weighted_bce(y, p, pos_weight=4.0, logits=True)
    trainer = Trainer(state, loss_fn, pred_key="logits", num_classes=2)

    # 3. train
    key = jax.random.key(1)
    it = iter(ds)
    t0 = time.time()
    for step in range(args.steps):
        raw = next(it)
        key, k1, k2 = jax.random.split(key, 3)
        batch = preprocess(raw, k1, train=True)
        trainer.state, out = trainer.train_step(trainer.state, batch, k2)
        if step % 10 == 0:
            print(f"step {step}: loss={float(out['loss']):.4f}")
    print(f"trained {args.steps} steps in {time.time() - t0:.1f}s")

    # 4. eval on fresh batches
    cm = metrics.init_metric_state(2)
    for _ in range(4):
        raw = next(it)
        key, k1 = jax.random.split(key)
        x, y = preprocess(raw, k1, train=False)
        out = trainer.eval_step(trainer.state, (x, y))
        cm = cm + out["cm"]
    final = {k: float(v) for k, v in metrics.finalize_metrics(cm).items()}
    print("eval:", json.dumps(final))

    # 5. tiled full-scene inference -> GeoTIFF
    rng = np.random.default_rng(7)
    scene = rng.uniform(0.05, 0.3, (5 * KERNEL, 5 * KERNEL, len(BANDS))).astype(np.float32)
    scene[100:140, 100:150] += 0.5  # a "solar farm"
    variables = {"params": trainer.state.params, "batch_stats": trainer.state.batch_stats}

    def predict(chips):
        return model.apply(variables, chips)["probs"]

    engine = TiledInferenceEngine(
        predict, kernel=KERNEL, buffer=KERNEL // 2, batch_size=8, out_channels=1
    )
    t0 = time.time()
    pred = np.asarray(engine.predict_scene(scene))
    dt = time.time() - t0
    mpix = scene.shape[0] * scene.shape[1] / 1e6
    print(f"scene inference: {scene.shape} in {dt:.2f}s ({mpix / dt:.2f} MPix/s)")

    tif = os.path.join(outdir, "solar_pred.tif")
    write_geotiff(tif, pred, transform=(10.0, 0, 500000.0, 0, -10.0, 4500000.0),
                  crs="EPSG:32617", nodata=255)
    back, meta = read_geotiff(tif)
    print(f"geotiff: {tif} shape={back.shape} crs={meta.get('crs')} "
          f"mean_prob_in_farm={pred[100:140, 100:150, 0].mean():.3f} "
          f"mean_prob_bg={pred[200:, 200:, 0].mean():.3f}")
    assert back.shape == pred.shape
    print("OK")


if __name__ == "__main__":
    main()
