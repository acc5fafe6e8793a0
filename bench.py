"""Benchmark: full-scene tiled inference throughput (the north-star metric).

Compares the framework's batched, device-resident overlap-tile engine
against the reference's inference pattern — one synchronous batch-1
``model.predict`` per chip with host round-trips and host-side stitching
(utils/prediction_tools.py:133-156) — using the SAME model and chip
geometry (BASELINE.json config #1: solar U-Net, 256x256 kernel + 128
buffer, 4-band Sentinel-2 scene) on the same device.

Our pipeline is the production configuration: scenes ship to the device as
raw uint16 DNs (half the H2D bytes of float32), normalization fuses into
the jitted engine program, and a background thread stages scene N+1 onto
the device while scene N computes (inference.tiles.predict_scenes). The
reference pattern ships float32 per-chip with a host round-trip per chip.

Prints ONE JSON line:
  {"metric": ..., "value": MPix/s (ours, steady multi-scene), "unit":
   "MPix/s", "vs_baseline": ours / reference-pattern}
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

KERNEL, BUFFER, BANDS = 256, 128, 4
SCENE = 1920  # pixels per side; reference-mode grid -> 6x6 chips
BATCH = 12  # chips per forward group per scene (x N_SCENES under vmap)
N_SCENES = 6  # pipelined sweep length (multi-state workload shape)


def _enable_compile_cache():
    """Persistent XLA compilation cache: first-run compiles (minutes over
    the TPU tunnel) amortize across processes."""
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_enable_compile_cache()

from satellite_computervision_tpu.inference import TiledInferenceEngine  # noqa: E402
from satellite_computervision_tpu.models import UNet  # noqa: E402
from satellite_computervision_tpu.ops.chips import generate_chip_indices  # noqa: E402


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


def make_engine(model, variables):
    predict = lambda chips: model.apply(variables, chips)["probs"]
    return TiledInferenceEngine(
        predict,
        kernel=KERNEL,
        buffer=BUFFER,
        batch_size=BATCH,
        out_channels=1,
        blend="overwrite",
        index_mode="reference",
        preprocess_fn=lambda s: s.astype(jnp.float32) / 10000.0,
        output_transform=lambda p: (p * 255.0).astype(jnp.uint8),
    )


def bench_ours(model, variables, scenes, repeats=3):
    engine = make_engine(model, variables)
    stack = np.stack(scenes)  # (S, H, W, BANDS) uint16
    # compile + warm (np.asarray: this backend's block_until_ready does not
    # reliably wait; a D2H read does)
    np.asarray(engine.predict_scene_batch(stack))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        # one H2D of the uint16 stack, one program, one uint8 D2H — the
        # multi-scene sweep shape; every prediction read back for export
        np.asarray(engine.predict_scene_batch(stack))
        times.append((time.perf_counter() - t0) / len(scenes))
    return min(times)  # seconds per scene, steady state


def bench_reference_pattern(model, variables, scene_u16, max_chips=8):
    """The reference loop: batch-1 forward per chip, float32 host transfer
    per chip, numpy stitching. Timed over a subset and extrapolated."""
    half = BUFFER // 2
    idx = generate_chip_indices(SCENE, SCENE, KERNEL, BUFFER, mode="reference")
    predict1 = jax.jit(
        lambda chip: model.apply(variables, chip[None])["probs"][0]
    )
    scene_np = scene_u16.astype(np.float32) / 10000.0
    chip0 = scene_np[idx[0][0] - half : idx[0][0] + KERNEL + half,
                     idx[0][1] - half : idx[0][1] + KERNEL + half]
    np.asarray(predict1(jnp.asarray(chip0)))  # warm

    template = np.zeros((SCENE, SCENE), np.float32)
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
    scenes = [
        rng.integers(0, 3000, (SCENE, SCENE, BANDS)).astype(np.uint16)
        for _ in range(N_SCENES)
    ]
    model, variables = build_model()

    ours_s = bench_ours(model, variables, scenes)
    ref_s = bench_reference_pattern(model, variables, scenes[0])

    mpix = SCENE * SCENE / 1e6
    ours = mpix / ours_s
    ref = mpix / ref_s
    print(
        json.dumps(
            {
                "metric": "tiled-inference scene throughput, solar U-Net 256+128 "
                "4-band, pipelined uint16 scenes (vs reference batch-1 per-chip "
                "predict loop)",
                "value": round(ours, 3),
                "unit": "MPix/s",
                "vs_baseline": round(ours / ref, 2),
            }
        )
    )


def overlap_experiment():
    """--overlap: can thread-staged H2D hide behind compute on this relay?"""
    import threading

    rng = np.random.default_rng(0)
    stacks = [
        rng.integers(0, 3000, (N_SCENES, SCENE, SCENE, BANDS)).astype(np.uint16)
        for _ in range(2)
    ]
    model, variables = build_model()
    engine = make_engine(model, variables)
    np.asarray(engine.predict_scene_batch(stacks[0]))  # warm via cache

    t0 = time.perf_counter()
    for s in stacks * 2:
        np.asarray(engine.predict_scene_batch(s))
    serial = time.perf_counter() - t0

    t0 = time.perf_counter()
    staged = jax.device_put(stacks[0])
    for i in range(4):
        holder = {}
        th = threading.Thread(
            target=lambda: holder.setdefault("d", jax.device_put(stacks[(i + 1) % 2]))
        )
        th.start()
        np.asarray(engine.predict_scene_batch(staged))
        th.join()
        staged = holder["d"]
    piped = time.perf_counter() - t0
    print(f"serial 4 sweeps: {serial:.2f}s; thread-staged: {piped:.2f}s "
          f"({serial / piped:.2f}x)")


if __name__ == "__main__":
    if "--overlap" in sys.argv:
        overlap_experiment()
        sys.exit(0)
    sys.exit(main())
