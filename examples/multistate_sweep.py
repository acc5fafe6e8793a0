"""Multi-state batch inference sweep with calibration + accuracy stats.

BASELINE.json config #5: sweep a trained model across state-sized scenes
(DE/MD/PA/NY/VA/WV in the reference's deployment), with cross-scene
histogram calibration and per-state accuracy statistics. Synthetic scenes
stand in for the STAC composites; the compute path is the production one:
one vmapped engine program for the whole stack (or pipelined streaming),
uint16 in / uint8 out, calibration harmonizing each state's radiometry to
the first before inference.

Usage: python examples/multistate_sweep.py
"""


# allow `python examples/<name>.py` from anywhere: put the repo root (the
# package home) and this directory (convergence_common) on sys.path
import os as _os
import sys as _sys

_here = _os.path.dirname(_os.path.abspath(__file__))
for _p in (_os.path.dirname(_here), _here):
    if _p not in _sys.path:
        _sys.path.insert(0, _p)

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from satellite_computervision_tpu.cloud.calibration import equalize_collection
from satellite_computervision_tpu.inference import TiledInferenceEngine
from satellite_computervision_tpu.models import UNet, metrics

STATES = ["DE", "MD", "PA", "NY", "VA", "WV"]
K, B, C = 64, 32, 4
H = W = 320


def synth_state(rng, bias):
    """A state scene with its own radiometric bias + ground truth."""
    scene = rng.uniform(0.05, 0.25, (H, W, C)).astype(np.float32) * bias
    truth = np.zeros((H, W), np.int32)
    for _ in range(6):
        y, x = rng.integers(10, H - 30, 2)
        h, w = rng.integers(10, 24, 2)
        scene[y : y + h, x : x + w] += 0.4 * bias
        truth[y : y + h, x : x + w] = 1
    return scene, truth


def main():
    rng = np.random.default_rng(0)
    biases = [1.0, 1.3, 0.8, 1.1, 0.9, 1.2]  # per-state radiometry drift
    scenes, truths = zip(*(synth_state(rng, b) for b in biases))

    # 1. cross-scene calibration: harmonize every state to the first
    #    (utils/calibration.py equalize_collection equivalent)
    calibrated = equalize_collection(list(scenes))

    # 2. a lightweight "trained" model: threshold on mean reflectance,
    #    expressed as a conv net stand-in (keeps the example fast; swap in
    #    a trained UNet checkpoint for real use)
    def predict(chips):
        score = chips.mean(-1, keepdims=True)
        return jax.nn.sigmoid((score - 0.28) * 40.0)

    engine = TiledInferenceEngine(
        predict, kernel=K, buffer=B, batch_size=8, out_channels=1,
        output_transform=lambda p: (p * 255.0).astype(jnp.uint8),
    )

    # 3. one vmapped program for the whole sweep
    stack = np.stack(calibrated)
    t0 = time.time()
    preds = np.asarray(engine.predict_scene_batch(stack))
    dt = time.time() - t0
    mpix = stack.shape[0] * H * W / 1e6

    # 4. per-state accuracy stats
    report = {}
    for name, pred, truth in zip(STATES, preds, truths):
        cm = metrics.confusion_matrix(truth, (pred[..., 0] > 127).astype(np.int32), 2)
        stats = {k: round(float(v), 4) for k, v in metrics.finalize_metrics(cm).items()}
        report[name] = stats
    print(json.dumps(report, indent=2))
    print(f"sweep: {len(STATES)} states, {mpix:.1f} MPix in {dt:.2f}s")
    worst = min(report.values(), key=lambda s: s["mean_iou"])
    assert worst["mean_iou"] > 0.7, report
    print("OK")


if __name__ == "__main__":
    main()
