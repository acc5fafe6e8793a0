"""On-device auto-tuning of the tiled-inference chip geometry.

The reference hard-codes one chip geometry per project (kernel 256 +
buffer 128, utils/prediction_tools.py:87-131) because its per-chip
``model.predict`` loop is host-bound either way. On TPU the engine is
compute-bound and XLA's conv efficiency varies strongly with the
batch/spatial split of the same pixel budget (measured on v5e: batch-16
x ~500^2 chips reach ~25% MFU where batch-1 giant-spatial runs ~6%; see
``bench.py --probe-batch``). For a fully-convolutional model the chip
geometry is a free serving-time choice — every geometry with enough
context buffer computes the same function — so the right kernel/buffer
is a measurement, not a constant.

``tune_engine_geometry`` builds one engine per candidate geometry, times
each compiled scene program on the live device (scalar-readback, the
only reliable sync on some backends), and returns the ranked table plus
the winning engine. Measured r3 effect on the solar U-Net, 1920^2 scene,
seam-free hann coverage: 119 ms (k256+b128 reference geometry) -> 47-57
ms (k512) — a ~2x serving speedup from configuration alone.

Timings are device-resident (the scene is staged once); compile time is
excluded (warm-up call before the timed reps). With a persistent
compilation cache, re-tuning the same (model, scene-shape) is
compile-free.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from satellite_computervision_tpu.inference.tiles import TiledInferenceEngine


@dataclass
class GeometryTiming:
    """One measured candidate. ``tile_mode='whole'`` rows have kernel =
    ``max(h, w)`` of the tuned scene (the long side; there is no chip
    kernel in whole mode) and buffer = 0."""

    kernel: int
    buffer: int
    tile_mode: str
    ms: float

    def label(self) -> str:
        if self.tile_mode == "whole":
            return "whole-scene"
        return f"k{self.kernel}+b{self.buffer}"


def candidate_geometries(
    scene_hw: Tuple[int, int],
    chip_multiple: int = 32,
    max_chip: int = 1024,
) -> List[Tuple[int, int]]:
    """Default (kernel, buffer) candidates for a scene.

    Kernels span the measured sweet-spot range (~256-768 chip side on
    v5e) subject to: chip side (kernel + buffer) a multiple of
    ``chip_multiple`` (the model's total downsampling, so every chip
    reshapes cleanly through the encoder), buffer <= kernel (hann
    constraint), and kernel no larger than the scene (a kernel above the
    scene side degenerates to one padded chip — the whole-scene mode
    covers that case better).
    """
    side = min(scene_hw)
    out = []
    for kernel in (256, 384, 512, 640):
        if kernel > side:
            continue
        for buffer in (64, 128):
            if buffer > kernel or (kernel + buffer) % chip_multiple:
                continue
            if kernel + buffer > max_chip:
                continue
            out.append((kernel, buffer))
    if not out:  # tiny scene: one conservative grid
        k = max(chip_multiple, (side // 2 // chip_multiple) * chip_multiple)
        out.append((k, min(k, chip_multiple)))
    return out


def _time_scalar(fn, arg, reps: int) -> float:
    """Best-of-``reps`` wall time of ``np.asarray(fn(arg))`` after one
    warm-up call (compile excluded). A full-output reduction + 1-element
    readback is the portable device sync (block_until_ready is unreliable
    on relay backends; a single-pixel probe lets XLA dead-code the
    program)."""
    np.asarray(fn(arg))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(arg))
        best = min(best, time.perf_counter() - t0)
    return best


def tune_engine_geometry(
    predict_fn: Callable,
    scene_shape: Tuple[int, int, int],
    scene_dtype=jnp.float32,
    *,
    out_channels: int = 1,
    blend: str = "hann",
    batch_size: int = 16,
    candidates: Optional[Sequence[Tuple[int, int]]] = None,
    include_whole: bool = True,
    chip_multiple: int = 32,
    preprocess_fn: Optional[Callable] = None,
    output_transform: Optional[Callable] = None,
    reps: int = 3,
    scene=None,
    max_rows: Optional[int] = None,
    verbose: Optional[Callable] = None,
) -> Tuple[TiledInferenceEngine, List[GeometryTiming]]:
    """Measure candidate chip geometries and return (best_engine, table).

    ``predict_fn`` must be fully convolutional (shift-equivariant up to
    its receptive field): only then is geometry a pure serving choice.
    ``scene`` optionally supplies representative pixels (timings do not
    depend on values, so synthetic zeros are used when omitted).
    ``max_rows`` bounds device memory exactly as on the engine: scenes
    taller than it stream in full-width bands. Tuning then measures one
    representative band (the banded program's unit of work) rather than
    the full scene — which could not fit on device, that being the reason
    to band — and every returned engine carries ``max_rows`` so the
    winner streams at serve time. ``verbose`` (e.g. ``print``) logs each
    row as it lands.
    """
    h, w, c = scene_shape
    if max_rows is not None and h > max_rows:
        h = max_rows
        scene_shape = (h, w, c)
        if scene is not None:
            # slice BEFORE asarray so a lazy file-backed scene
            # (geo.GeoTiffScene) decodes only the tuning band
            scene = np.asarray(scene[:h])
    if candidates is None:
        candidates = candidate_geometries((h, w), chip_multiple=chip_multiple)
    if scene is None:
        scene = jnp.zeros(scene_shape, scene_dtype)
    staged = jax.device_put(jnp.asarray(scene, scene_dtype))

    # readback-floor: the fixed cost of the sync itself, subtracted from
    # every row so rankings reflect program time, not link latency
    floor = _time_scalar(
        jax.jit(lambda s: s[0, 0, 0].astype(jnp.float32) * 2), staged, reps
    )

    def build(**kwargs):
        return TiledInferenceEngine(
            predict_fn,
            batch_size=batch_size,
            out_channels=out_channels,
            preprocess_fn=preprocess_fn,
            output_transform=output_transform,
            whole_multiple=chip_multiple,
            max_rows=max_rows,
            **kwargs,
        )

    rows: List[GeometryTiming] = []
    engines = {}
    for kernel, buffer in candidates:
        engine = build(kernel=kernel, buffer=buffer, blend=blend,
                       index_mode="grid")
        impl = engine._build(scene_shape, staged.dtype)
        run = jax.jit(lambda s, impl=impl: impl(s).astype(jnp.float32).sum())
        t = max(0.0, _time_scalar(run, staged, reps) - floor)
        row = GeometryTiming(kernel, buffer, "chips", round(t * 1e3, 2))
        rows.append(row)
        engines[(kernel, buffer, "chips")] = engine
        if verbose:
            verbose(f"  {row.label():>14}: {row.ms:8.2f} ms")
    if include_whole and h % chip_multiple == 0 and w % chip_multiple == 0:
        engine = build(kernel=256, buffer=128, tile_mode="whole")
        impl = engine._build(scene_shape, staged.dtype)
        run = jax.jit(lambda s, impl=impl: impl(s).astype(jnp.float32).sum())
        t = max(0.0, _time_scalar(run, staged, reps) - floor)
        row = GeometryTiming(max(h, w), 0, "whole", round(t * 1e3, 2))
        rows.append(row)
        engines[(max(h, w), 0, "whole")] = engine
        if verbose:
            verbose(f"  {row.label():>14}: {row.ms:8.2f} ms")

    rows.sort(key=lambda r: r.ms)
    best = rows[0]
    return engines[(best.kernel, best.buffer, best.tile_mode)], rows


def save_tune_table(path, rows: Sequence[GeometryTiming]) -> None:
    """Persist a measured geometry table (JSON) — next to the checkpoint
    by convention, so one `predict --tune` run pins the serving geometry
    for every later serve of that model (the reference re-hardcodes
    256+128 everywhere instead, utils/prediction_tools.py:87-131)."""
    import dataclasses
    import json
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump([dataclasses.asdict(r) for r in rows], f, indent=1)


def load_tune_table(path) -> List[GeometryTiming]:
    """Read a :func:`save_tune_table` file back, best row first."""
    import json

    with open(path) as f:
        rows = [GeometryTiming(**d) for d in json.load(f)]
    rows.sort(key=lambda r: r.ms)
    return rows
