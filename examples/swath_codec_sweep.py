#!/usr/bin/env python
"""Swath-scale codec→engine→codec sweep: the measured disk-to-disk loop.

The reference's state-sweep serving reads LZW-compressed COGs through
rasterio/GDAL, predicts chip-by-chip, and materializes whole scenes
before writing (utils/raster_tools.py:367-461 numpy_to_raster/
arrays_to_cog; utils/prediction_tools.py:447-536). This demo proves the
self-contained twin of that loop AT SWATH SCALE with everything
measured:

1. synthesize N LZW + predictor-2 compressed COG scenes (default
   8192x8192x4 uint16 — 512 MB raw apiece) through the STREAMING cog
   writer (geo.GeoTiffCogStreamWriter, native scv_lzw_encode), so even
   synthesis is O(band) memory;
2. calibrate per band from a COG OVERVIEW page (percentile clamp+scale,
   cloud/calibration.py:23-31 semantics) — O(overview) host cost, never
   the full scene;
3. serve each scene through the banded tiled engine (``max_rows``:
   full-width bands, hann blend, BN-folded solar-class U-Net) with the
   calibration fused into the device preprocess;
4. stream predictions straight into a tiled COG with overview pyramids
   (engine.predict_scene_to_geotiff(cog=True)).

Host memory stays O(band) END TO END — the scene is never materialized
on either side — which the run proves by reporting resident memory
(``rss_now_mb``) against the raw scene size: flat across scenes on a
normal host (CPU run: +2 MB over 4 scenes). NOTE on the TPU tunnel:
the relay client leaks ~96% of every H2D transfer's bytes host-side
(measured: 12x device_put of one 75 MB array -> +900 MB RSS; DEVNOTES),
so rss grows with TRANSFERRED volume there — a platform defect outside
the pipeline, which is why both platforms' records land in the log.
Appends one JSONL record per scene plus a summary to ``--log`` and
prints the summary as the last line.

Run directly, or through the benchmark: ``python bench.py --swath``.
Cold-cache compiles on the TPU tunnel take minutes; warm runs are
dominated by the relay wire + LZW codec work.
"""

# allow `python examples/<name>.py` from anywhere
import os as _os
import sys as _sys

_here = _os.path.dirname(_os.path.abspath(__file__))
for _p in (_os.path.dirname(_here), _here):
    if _p not in _sys.path:
        _sys.path.insert(0, _p)

import argparse
import json
import os
import resource
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from satellite_computervision_tpu.geo import (  # noqa: E402
    GeoTiffCogStreamWriter,
    GeoTiffScene,
)
from satellite_computervision_tpu.inference import TiledInferenceEngine  # noqa: E402
from satellite_computervision_tpu.models import UNet, fold_unet_variables  # noqa: E402

TRANSFORM = (10.0, 0.0, 500000.0, 0.0, -10.0, 4500000.0)


def _rss_mb() -> float:
    """Lifetime peak RSS (ru_maxrss) — never decreases, so a cold XLA
    compile's transient host memory stays in it forever."""
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def _rss_now_mb() -> float:
    """CURRENT resident set (VmRSS): the honest O(band) steady-state
    measure — compile transients released by the allocator drop out."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return _rss_mb()


def synthesize_scene(path, height, width, bands, seed, band_rows=1024,
                     tile_size=256):
    """Stream a smooth-field uint16 scene into an LZW+predictor-2 COG.

    Spatially correlated content (low-res normals, bilinearly upsampled
    per row-block) so LZW+differencing actually compresses, as real
    reflectance rasters do — white noise would EXPAND under LZW."""
    rng = np.random.default_rng(seed)
    cell = 64
    low = rng.normal(0.45, 0.18, (height // cell + 2, width // cell + 2,
                                  bands)).astype(np.float32)
    with GeoTiffCogStreamWriter(
        path, height, width, bands, np.uint16, transform=TRANSFORM,
        crs="EPSG:32617", compress="lzw", predictor=2, tile_size=tile_size,
    ) as wr:
        xs = np.arange(width, dtype=np.float32) / cell
        x0 = xs.astype(np.int32)
        fx = (xs - x0)[None, :, None]
        for y in range(0, height, band_rows):
            n = min(band_rows, height - y)
            ys = (y + np.arange(n, dtype=np.float32)) / cell
            y0 = ys.astype(np.int32)
            fy = (ys - y0)[:, None, None]
            a = low[y0][:, x0] * (1 - fy) * (1 - fx) + low[y0 + 1][:, x0] * fy * (1 - fx)
            b = low[y0][:, x0 + 1] * (1 - fy) * fx + low[y0 + 1][:, x0 + 1] * fy * fx
            block = np.clip((a + b) * 3000.0, 0, 10000)
            block += rng.normal(0, 12.0, block.shape)
            wr.write_rows(np.clip(block, 0, 65535).astype(np.uint16))
    return os.path.getsize(path)


def overview_calibration(path, percentiles=(1, 99)):
    """Per-band clamp+scale bounds from the COG's coarsest overview —
    the O(overview) stand-in for cloud.calibration.clamp_and_scale's
    full-scene percentiles (utils/calibration.py:12-45)."""
    page = 0
    while True:
        try:
            sc = GeoTiffScene(path, page + 1)
        except Exception:
            break
        page += 1
        if max(sc.shape[:2]) <= 1024:
            break
    ov = np.asarray(GeoTiffScene(path, page), np.float32)
    lo = np.percentile(ov, percentiles[0], axis=(0, 1))
    hi = np.percentile(ov, percentiles[1], axis=(0, 1))
    return lo.astype(np.float32), hi.astype(np.float32), page


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scenes", type=int, default=2)
    ap.add_argument("--height", type=int, default=8192)
    ap.add_argument("--width", type=int, default=8192)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--kernel", type=int, default=512)
    ap.add_argument("--buffer", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max-rows", type=int, default=None,
                    help="band height for the streaming engine (default: "
                    "2 chip rows + buffer)")
    ap.add_argument("--filters", type=int, nargs="*",
                    default=[32, 64, 128, 256, 512])
    ap.add_argument("--dir", default=None,
                    help="scene/output directory (default: temp dir)")
    ap.add_argument("--log", default="runs/swath_codec_sweep.jsonl")
    ap.add_argument("--keep", action="store_true",
                    help="keep the synthesized/predicted GeoTIFFs")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    max_rows = args.max_rows or (2 * args.kernel + args.buffer)
    workdir = args.dir or tempfile.mkdtemp(prefix="scv_swath_")
    os.makedirs(workdir, exist_ok=True)
    os.makedirs(os.path.dirname(args.log) or ".", exist_ok=True)
    raw_mb = args.height * args.width * args.bands * 2 / 1e6
    mpix = args.height * args.width / 1e6
    rss_start = _rss_now_mb()  # current RSS: same metric as rss_growth's end
    records = []

    # ---- 1. synthesize the LZW+predictor COG inputs ----------------------
    paths = []
    t0 = time.perf_counter()
    for i in range(args.scenes):
        p = os.path.join(workdir, f"scene_{i}.tif")
        size = synthesize_scene(p, args.height, args.width, args.bands,
                                args.seed + i)
        paths.append(p)
        print(f"synthesized {p}: {args.height}x{args.width}x{args.bands} "
              f"uint16, lzw+p2 = {size / 1e6:.0f} MB "
              f"({size / (raw_mb * 1e6):.2f} of raw)", flush=True)
    t_synth = time.perf_counter() - t0

    # ---- 2. model + engine ------------------------------------------------
    model = UNet(
        n_classes=1, filters=tuple(args.filters),
        factors=(2,) * len(args.filters), head="sigmoid", dtype=jnp.bfloat16,
    )
    side = args.kernel + args.buffer
    variables = model.init(
        jax.random.key(args.seed), jnp.zeros((1, side, side, args.bands)))
    fmodel, fvars = fold_unet_variables(model, variables)

    # Collection-level calibration: one clamp+scale for the whole sweep,
    # estimated from the scenes' OVERVIEW pages (cheap), exactly as
    # cloud/calibration.equalize_collection normalizes a collection to a
    # shared target. Per-scene constants would bake into the jitted
    # program and force a full recompile + weight re-staging per scene —
    # the one-compiled-program engine must be reused across the sweep.
    los, his = [], []
    for p in paths:
        lo, hi, page = overview_calibration(p)
        los.append(lo)
        his.append(hi)
    lo_d = jnp.asarray(np.median(los, axis=0))
    hi_d = jnp.asarray(np.median(his, axis=0))
    print(f"collection calibration from overview page {page}: "
          f"lo={np.round(np.median(los, 0), 1).tolist()} "
          f"hi={np.round(np.median(his, 0), 1).tolist()}", flush=True)

    def preprocess(s):
        x = s.astype(jnp.float32)
        return jnp.clip((x - lo_d) / jnp.maximum(hi_d - lo_d, 1e-6), 0, 1)

    engine = TiledInferenceEngine(
        lambda chips: fmodel.apply(fvars, chips)["probs"],
        kernel=args.kernel, buffer=args.buffer, batch_size=args.batch,
        out_channels=1, blend="hann", index_mode="grid",
        max_rows=max_rows, preprocess_fn=preprocess,
        output_transform=lambda pr: (pr * 255.0).astype(jnp.uint8),
    )

    for i, p in enumerate(paths):
        scene = GeoTiffScene(p)  # lazy: bands decode on demand
        out = os.path.join(workdir, f"pred_{i}.tif")
        t0 = time.perf_counter()
        engine.predict_scene_to_geotiff(scene, out, transform=TRANSFORM,
                                        crs="EPSG:32617", cog=True)
        dt = time.perf_counter() - t0
        rec = {
            "platform": jax.default_backend(),
            "scene": i, "height": args.height, "width": args.width,
            "bands": args.bands, "raw_mb": round(raw_mb, 1),
            "in_mb": round(os.path.getsize(p) / 1e6, 1),
            "out_mb": round(os.path.getsize(out) / 1e6, 1),
            "calib_page": page,
            "kernel": args.kernel, "buffer": args.buffer,
            "max_rows": max_rows, "secs": round(dt, 2),
            "mpix_per_s": round(mpix / dt, 2),
            "peak_rss_mb": round(_rss_mb(), 1),
            "rss_now_mb": round(_rss_now_mb(), 1),
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)
        if not args.keep:
            os.remove(out)

    steady = records[1:] or records  # first scene pays the compile
    summary = {
        "platform": jax.default_backend(),
        "swath_scenes": args.scenes,
        "scene_mpix": round(mpix, 1),
        "raw_mb_per_scene": round(raw_mb, 1),
        "synth_secs": round(t_synth, 1),
        "synth_mb_per_s": round(args.scenes * raw_mb / t_synth, 1),
        "sweep_mpix_per_s": round(
            sum(r["mpix_per_s"] for r in steady) / len(steady), 2),
        "peak_rss_mb": round(_rss_mb(), 1),
        "rss_now_mb": round(_rss_now_mb(), 1),
        "rss_start_mb": round(rss_start, 1),
        # O(band) proof: steady-state resident memory (rss_now_mb) stays a
        # small multiple of one band, nowhere near N x raw scene size.
        # peak_rss_mb additionally carries any cold-compile transient
        # (lifetime max) — compare warm runs for the clean bound.
        "rss_growth_mb": round(_rss_now_mb() - rss_start, 1),
        "band_mb": round(max_rows * args.width * args.bands * 2 / 1e6, 1),
        "config": {"kernel": args.kernel, "buffer": args.buffer,
                   "batch": args.batch, "max_rows": max_rows},
    }
    with open(args.log, "a") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")
        f.write(json.dumps({"summary": summary}) + "\n")
    if not args.keep:
        for p in paths:
            os.remove(p)
    print("SWATH " + json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
