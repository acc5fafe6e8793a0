"""Benchmark: full-scene tiled inference throughput (the north-star metric).

Compares the framework's batched, device-resident overlap-tile engine
against the reference's inference pattern — one synchronous batch-1
``model.predict`` per chip with host round-trips and host-side stitching
(utils/prediction_tools.py:133-156) — using the SAME model and chip
geometry (BASELINE.json config #1: solar U-Net, 256x256 kernel + 128
buffer, 4-band Sentinel-2 scene) on the same device.

Prints ONE JSON line:
  {"metric": ..., "value": MPix/s (ours), "unit": "MPix/s",
   "vs_baseline": ours / reference-pattern}
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from satellite_computervision_tpu.inference import TiledInferenceEngine
from satellite_computervision_tpu.models import UNet
from satellite_computervision_tpu.ops.chips import generate_chip_indices

KERNEL, BUFFER, BANDS = 256, 128, 4
SCENE = 1920  # pixels per side; reference-mode grid -> 6x6 chips
BATCH = 8


def build_model():
    model = UNet(
        n_classes=1,
        filters=(32, 64, 128, 256, 512),
        factors=(2, 2, 2, 2, 2),
        head="sigmoid",
        dtype=jnp.bfloat16,
    )
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, KERNEL + BUFFER, KERNEL + BUFFER, BANDS))
    )
    return model, variables


def bench_ours(model, variables, scene, repeats=3):
    predict = lambda chips: model.apply(variables, chips)["probs"]
    engine = TiledInferenceEngine(
        predict,
        kernel=KERNEL,
        buffer=BUFFER,
        batch_size=BATCH,
        out_channels=1,
        blend="overwrite",
        index_mode="reference",
    )
    out = engine.predict_scene(scene)  # compile + warm
    jax.block_until_ready(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(engine.predict_scene(scene))
        times.append(time.perf_counter() - t0)
    return min(times)


def bench_reference_pattern(model, variables, scene, max_chips=8):
    """The reference loop: batch-1 forward per chip, host transfer per chip,
    numpy stitching. Timed over a subset of chips and extrapolated."""
    half = BUFFER // 2
    side = KERNEL + BUFFER
    idx = generate_chip_indices(*scene.shape[:2], KERNEL, BUFFER, mode="reference")
    predict1 = jax.jit(
        lambda chip: model.apply(variables, chip[None])["probs"][0]
    )
    scene_np = np.asarray(scene)
    # warm the single-chip executable
    chip = scene_np[idx[0][0] - half : idx[0][0] + KERNEL + half,
                    idx[0][1] - half : idx[0][1] + KERNEL + half]
    np.asarray(predict1(jnp.asarray(chip)))

    template = np.zeros(scene.shape[:2], np.float32)
    n = min(max_chips, len(idx))
    t0 = time.perf_counter()
    for y, x in idx[:n]:
        chip = scene_np[y - half : y + KERNEL + half, x - half : x + KERNEL + half]
        pred = np.asarray(predict1(jnp.asarray(chip)))  # host->dev, dev->host
        template[y : y + KERNEL, x : x + KERNEL] += pred[half : half + KERNEL,
                                                         half : half + KERNEL, 0]
    per_chip = (time.perf_counter() - t0) / n
    return per_chip * len(idx)


def main():
    rng = np.random.default_rng(0)
    scene = rng.uniform(0.0, 0.3, (SCENE, SCENE, BANDS)).astype(np.float32)
    model, variables = build_model()

    ours_s = bench_ours(model, variables, scene)
    ref_s = bench_reference_pattern(model, variables, scene)

    mpix = SCENE * SCENE / 1e6
    ours = mpix / ours_s
    ref = mpix / ref_s
    print(
        json.dumps(
            {
                "metric": "tiled-inference scene throughput, solar U-Net 256+128 "
                "4-band (vs reference batch-1 per-chip predict loop)",
                "value": round(ours, 3),
                "unit": "MPix/s",
                "vs_baseline": round(ours / ref, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
