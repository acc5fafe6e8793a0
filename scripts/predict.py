#!/usr/bin/env python
"""Full-scene prediction CLI — the reference notebooks' inference cells
(solar cells 75-85: export -> doPrediction -> GeoTIFF/EE upload).

Two input modes:
  scene: a .npy (H, W, C) scene -> tiled inference -> GeoTIFF/COG
  patches: a directory of EE-exported TFRecord patches + mixer.json ->
           batched prediction -> EE-ingestable TFRecords (+ optional tif)

Examples:
  python scripts/predict.py scene --input scene.npy --ckpt runs/solar \
      --config solar --output pred.tif --crs EPSG:32617 \
      --transform 10 0 500000 0 -10 4500000
  python scripts/predict.py patches --input exports/ --ckpt runs/solar \
      --config solar --outdir preds/ --base solar_md
"""

import argparse
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp
import optax

from satellite_computervision_tpu.geo import write_cog, write_geotiff
from satellite_computervision_tpu.inference import TiledInferenceEngine
from satellite_computervision_tpu.inference.batch import list_export_files, run_batch_prediction
from satellite_computervision_tpu.inference.mixer import read_mixer
from satellite_computervision_tpu.models import DeepLabV3Plus, UNet
from satellite_computervision_tpu.train import create_train_state, load_checkpoint
from satellite_computervision_tpu.train.config import CONFIGS as _ALL_CONFIGS

CONFIGS = dict(_ALL_CONFIGS)


def resolve_serving_geometry(cfg, args, ckpt_dir=None):
    """The serving-geometry policy, in precedence order:

    1. explicit ``--kernel`` / ``--buffer`` / ``--batch-size`` flags;
    2. a cached tune table (``<ckpt>/tune.json``, written by a previous
       ``--tune`` run) — its measured best row, including whole-scene;
    3. the preset's measured serving geometry
       (``TrainConfig.serving_geometry``; e.g. solar serves k512+b128
       batch 16, ~2x the k256 training geometry it was benched against).

    The reference hard-codes the training chip size into its predict loop
    (utils/prediction_tools.py:87-131); here geometry is a serving choice.
    Returns (kernel, buffer, batch, tile_mode, source-string).
    """
    import os

    kernel, buffer, batch = cfg.serving_geometry
    tile_mode, source = args.tile_mode, "preset"
    explicit = (args.kernel is not None or args.buffer is not None
                or args.tile_mode != "chips")
    table = (os.path.join(ckpt_dir, "tune.json")
             if ckpt_dir and not explicit else None)
    if table and os.path.exists(table):
        from satellite_computervision_tpu.inference.tune import load_tune_table

        best = load_tune_table(table)[0]
        source = f"tune table ({best.ms:.1f} ms/scene)"
        if best.tile_mode == "whole":
            tile_mode = "whole"
        else:
            kernel, buffer, tile_mode = best.kernel, best.buffer, "chips"
    if args.kernel is not None:
        kernel, source = args.kernel, "flags"
    if args.buffer is not None:
        buffer, source = args.buffer, "flags"
    if args.batch_size is not None:
        batch = args.batch_size
    return kernel, buffer, batch, tile_mode, source


def load_scene(path, max_rows=None):
    """Scene input -> ((H, W, C) array, meta dict). ``.npy`` loads bare
    (empty meta); ``.tif``/``.tiff`` reads through the self-contained
    GeoTIFF codec and carries transform/crs/nodata defaults from the file
    so round-tripping a scene through predict preserves georeferencing.
    With ``max_rows`` set and a taller GeoTIFF, the scene stays
    file-backed (geo.GeoTiffScene): the banded engine then decodes only
    O(band) rows at a time — scenes larger than host RAM stream from
    disk."""
    if path.endswith((".tif", ".tiff")):
        from satellite_computervision_tpu.geo import GeoTiffScene

        sc = GeoTiffScene(path)
        if max_rows is not None and sc.shape[0] > max_rows:
            return sc, sc.meta
        return np.asarray(sc), sc.meta
    # banded .npy scenes memory-map: the band jobs slice views, so only
    # the touched pages are ever resident (the OS manages the window) —
    # tall .npy swaths stream like GeoTIFFs do
    scene = np.load(path, mmap_mode="r" if max_rows is not None else None)
    meta = {}
    if scene.ndim == 2:
        scene = scene[..., None]
    return scene, meta


def load_model(cfg, ckpt_dir, bf16=True, arch="unet", space_to_depth=None):
    """Rebuild the serving model and restore ``<ckpt>/best`` into it.

    ``space_to_depth=None`` follows the config default (solar trains the
    S2D stem from scratch as of round 5); if the checkpoint was trained
    with the other stem the restore structure mismatches, so the U-Net
    path auto-retries once with the stem flipped — old plain-stem solar
    checkpoints keep serving after the default flip, and explicit
    ``--s2d/--no-s2d`` still wins."""
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    explicit = space_to_depth is not None
    if space_to_depth is None:
        space_to_depth = bool(getattr(cfg, "space_to_depth", False))

    def build(s2d):
        if arch in ("unet", "deeplab"):
            kwargs = dict(
                n_classes=cfg.num_classes,
                head="sigmoid" if cfg.num_classes == 1 else "softmax",
                threshold=cfg.threshold,
                dtype=dtype,
            )
            if arch == "deeplab":
                model = DeepLabV3Plus(**kwargs)
            else:
                model = UNet(space_to_depth=s2d, **kwargs)
            example = (jnp.zeros((1, cfg.kernel_size, cfg.kernel_size,
                                  len(cfg.bands))),)
        else:
            from satellite_computervision_tpu.train.zoo import get_family

            family = get_family(arch)
            model = family.build(cfg, dtype=dtype)
            example = tuple(jnp.asarray(a) for a in family.example_inputs(cfg))
        state = create_train_state(
            model, jax.random.key(0), example[0], tx=optax.adam(1e-3),
            model_args=example[1:],
        )
        return model, state

    model, state = build(space_to_depth)
    try:
        state, meta = load_checkpoint(f"{ckpt_dir}/best", state)
    except (ValueError, KeyError):
        if explicit or arch != "unet":
            raise
        flipped = not space_to_depth
        model, state = build(flipped)
        state, meta = load_checkpoint(f"{ckpt_dir}/best", state)
        print(f"note: checkpoint stem differs from the config default — "
              f"serving space_to_depth={flipped}")
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    print(f"restored checkpoint (meta: {json.dumps(meta)})")
    return model, variables


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["scene", "change", "patches", "sweep"])
    ap.add_argument("--input", help="scene/patches input (.npy / export dir); "
                    "sweep mode: a directory or glob of .npy/.tif scenes")
    ap.add_argument("--input-before", help="change mode: before .npy scene")
    ap.add_argument("--input-after", help="change mode: after .npy scene")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--config", choices=sorted(CONFIGS), default="solar")
    ap.add_argument("--model", choices=["unet", "deeplab", "siamese"], default=None,
                    help="default: the config's family")
    ap.add_argument("--output", help="scene mode: output .tif path")
    ap.add_argument("--outdir", help="patches mode: output directory")
    ap.add_argument("--base", default="pred", help="patches mode: output basename")
    ap.add_argument("--batch-size", type=int, default=None,
                    help="chips per forward (default: the config's serving "
                    "batch)")
    ap.add_argument("--kernel", type=int, default=None,
                    help="engine chip kernel (default: a cached tune table "
                    "next to the checkpoint if present, else the config's "
                    "measured serving geometry — solar serves k512, ~2x the "
                    "256-kernel training grid on v5e). Fully-convolutional "
                    "models accept any multiple of 32")
    ap.add_argument("--buffer", type=int, default=None,
                    help="engine chip context buffer (default: as --kernel)")
    ap.add_argument("--tune", action="store_true",
                    help="scene mode: measure candidate chip geometries on "
                    "the device first and serve the fastest "
                    "(inference.tune_engine_geometry; ~2x on v5e vs the "
                    "k256 reference geometry). Overrides --kernel/--buffer/"
                    "--tile-mode; honors --max-rows (tall scenes tune on "
                    "one band and serve banded)")
    ap.add_argument("--blend", choices=["overwrite", "hann"], default="hann")
    ap.add_argument("--tile-mode", choices=["chips", "whole"], default="chips",
                    help="whole = one fully-convolutional forward over the "
                    "padded scene (no tile seams; scene must fit in HBM)")
    ap.add_argument("--max-rows", type=int, default=None,
                    help="stream scenes taller than this in full-width bands "
                    "(bounds device memory; works with both tile modes)")
    ap.add_argument("--nodata", type=float, default=None,
                    help="cull chips whose full window is this value in "
                    "every band (accepts 'nan') — skips their forwards "
                    "entirely, exact on valid pixels; swath-edge scenes are "
                    "often 30-60%% nodata. Defaults to the input GeoTIFF's "
                    "nodata tag when present; chips tile-mode only")
    ap.add_argument("--cog", action="store_true", help="write Cloud-Optimized GeoTIFF")
    ap.add_argument("--compress", choices=["none", "deflate", "lzw"],
                    default="deflate",
                    help="output compression; lzw (+ --predictor 2) is "
                    "GDAL's common COG recipe")
    ap.add_argument("--predictor", type=int, choices=[1, 2, 3], default=1,
                    help="TIFF predictor on the output: 2 = integer "
                    "horizontal differencing (uint8 outputs, i.e. --uint8), "
                    "3 = float byte-plane differencing (probability "
                    "outputs)")
    ap.add_argument("--prefetch", type=int, default=2,
                    help="sweep mode: scenes staged ahead on device")
    ap.add_argument("--shard-index", type=int, default=0,
                    help="sweep mode: this worker's index — workers take "
                    "files round-robin, so N hosts split a multi-state "
                    "sweep without a scheduler (the Dask 2-24-worker "
                    "cluster's job, utils/pc_tools.py:564-618)")
    ap.add_argument("--shard-count", type=int, default=1,
                    help="sweep mode: total workers")
    ap.add_argument("--bucket", type=int, default=None,
                    help="sweep mode: pad each scene's H/W up to the next "
                    "multiple of this (edge-replicated), then crop the "
                    "prediction back. XLA compiles one program per exact "
                    "shape — heterogeneous sweeps otherwise pay a full "
                    "compile per distinct scene size. Exact for "
                    "blend=overwrite; hann values within ~kernel of a "
                    "padded edge can shift (extra chip rows join the "
                    "blend there)")
    ap.add_argument("--crs", default="")
    ap.add_argument("--transform", type=float, nargs=6,
                    help="affine: xscale xshear xtrans yshear yscale ytrans")
    ap.add_argument("--uint8", action="store_true", help="write probabilities x255 as uint8")
    ap.add_argument("--fold-bn", action="store_true",
                    help="serve the BN-folded program (UNet; numerically "
                    "identical to eval-mode BN, no BN ops in the compiled "
                    "program)")
    ap.add_argument("--s2d", action=argparse.BooleanOptionalAction, default=None,
                    help="unet: the checkpoint's stem (default: the config's "
                    "space_to_depth, auto-retrying the other stem on a "
                    "restore mismatch)")
    args = ap.parse_args(argv)

    cfg = CONFIGS[args.config]
    # predictor/dtype compatibility is knowable at parse time (the output
    # dtype is --uint8's choice) — fail here, not after minutes of device
    # inference inside the writer
    if args.predictor == 2 and not args.uint8:
        ap.error("--predictor 2 (integer differencing) needs --uint8 "
                 "output; use --predictor 3 for float probabilities")
    if args.predictor == 3 and args.uint8:
        ap.error("--predictor 3 (float byte-plane differencing) applies "
                 "to float output; use --predictor 2 with --uint8")
    comp_kw = dict(compress=args.compress, predictor=args.predictor)
    arch = args.model or ("siamese" if cfg.family == "siamese" else "unet")
    model, variables = load_model(cfg, args.ckpt, arch=arch,
                                  space_to_depth=args.s2d)
    # S2D halves the grid before the trunk: whole-scene padding must cover
    # one more factor of 2 (models/unet.py stem)
    whole_mult = 64 if getattr(model, "space_to_depth", False) else 32
    if args.fold_bn:
        if arch != "unet":
            sys.exit("--fold-bn currently supports the unet family only")
        from satellite_computervision_tpu.models import fold_unet_variables

        model, variables = fold_unet_variables(model, variables)
    predict = lambda chips: model.apply(variables, chips)["probs"]

    if args.mode == "change":
        # before/after scenes ride one engine pass as a 2C-band stack; the
        # siamese towers split it back per chip (run_local's shape,
        # utils/pc_tools.py:620-668)
        if not (args.input_before and args.input_after):
            sys.exit("change mode needs --input-before and --input-after")
        before, meta = load_scene(args.input_before)
        after, _ = load_scene(args.input_after)
        if before.shape != after.shape:
            sys.exit(f"scene shapes differ: {before.shape} vs {after.shape}")
        nb = before.shape[-1]
        stack = np.concatenate([before, after], axis=-1)
        predict_pair = lambda chips: model.apply(
            variables, chips[..., :nb], chips[..., nb:]
        )["probs"]
        kernel, buffer, batch, tile_mode, source = resolve_serving_geometry(
            cfg, args, args.ckpt)
        print(f"serving geometry: k{kernel}+b{buffer} batch {batch} "
              f"({source})")
        nodata = args.nodata if args.nodata is not None else meta.get("nodata")
        engine = TiledInferenceEngine(
            predict_pair, kernel=kernel, buffer=buffer,
            batch_size=batch, out_channels=1, blend=args.blend,
            tile_mode=tile_mode, max_rows=args.max_rows, nodata=nodata,
            output_transform=(lambda p: (p * 255.0).astype(jnp.uint8)) if args.uint8 else None,
        )
        pred = np.asarray(engine.predict_scene(stack))
        out = args.output or "change.tif"
        writer = write_cog if args.cog else write_geotiff
        writer(out, pred,
               transform=tuple(args.transform) if args.transform
               else meta.get("transform"),
               crs=args.crs or meta.get("crs", ""), **comp_kw)
        print(f"wrote {out} shape={pred.shape}")
        return

    if not args.input:
        sys.exit("--input is required for scene/patches modes")
    if args.mode == "scene":
        scene, meta = load_scene(args.input, args.max_rows)
        nodata = args.nodata if args.nodata is not None else meta.get("nodata")
        out_transform = (lambda p: (p * 255.0).astype(jnp.uint8)) if args.uint8 else None
        if args.tune:
            import os

            from satellite_computervision_tpu.inference import tune_engine_geometry
            from satellite_computervision_tpu.inference.tune import save_tune_table

            print("tuning chip geometry on device:")
            engine, rows = tune_engine_geometry(
                predict, scene.shape, scene.dtype,
                out_channels=cfg.num_classes, blend=args.blend,
                batch_size=args.batch_size or cfg.serving_geometry[2],
                output_transform=out_transform, chip_multiple=whole_mult,
                scene=scene, max_rows=args.max_rows, verbose=print,
            )
            table = os.path.join(args.ckpt, "tune.json")
            save_tune_table(table, rows)
            print(f"serving with {rows[0].label()} ({rows[0].ms:.1f} ms/scene); "
                  f"table cached at {table} (future runs use it by default)")
            # tuning times full grids (worst case); serving still culls
            engine.nodata = nodata
        else:
            kernel, buffer, batch, tile_mode, source = resolve_serving_geometry(
                cfg, args, args.ckpt)
            print(f"serving geometry: k{kernel}+b{buffer} batch {batch} "
                  f"tile_mode={tile_mode} ({source})")
            engine = TiledInferenceEngine(
                predict, kernel=kernel, buffer=buffer,
                batch_size=batch, out_channels=cfg.num_classes,
                blend=args.blend, tile_mode=tile_mode, max_rows=args.max_rows,
                nodata=nodata, output_transform=out_transform,
                whole_multiple=whole_mult,
            )
        out = args.output or "prediction.tif"
        out_tf = (tuple(args.transform) if args.transform
                  else meta.get("transform"))
        out_crs = args.crs or meta.get("crs", "")
        banded = (engine.max_rows is not None
                  and scene.shape[0] > engine.max_rows)
        if banded:
            # disk→disk streaming: output rows hit the GeoTIFF as each
            # band completes; with a file-backed input host memory is
            # O(band) end to end. --cog streams tiles + overview pyramids
            # (GeoTiffCogStreamWriter) at the same memory bound
            engine.predict_scene_to_geotiff(scene, out, transform=out_tf,
                                            crs=out_crs, cog=args.cog,
                                            **comp_kw)
            print(f"wrote {out} (streamed banded{', cog' if args.cog else ''}) "
                  f"shape={(scene.shape[0], scene.shape[1], cfg.num_classes)}")
            return
        if (nodata is not None and engine.tile_mode == "chips"
                and isinstance(scene, np.ndarray)):
            v = engine.chip_validity(scene)
            print(f"nodata={nodata}: {int(v.sum())}/{len(v)} chips carry "
                  f"valid pixels; culling the rest")
            pred = np.asarray(engine.predict_scene(scene, valid_chips=v))
        else:
            # lazy/banded scenes cull per band inside the engine
            pred = np.asarray(engine.predict_scene(scene))
        writer = write_cog if args.cog else write_geotiff
        writer(out, pred, transform=out_tf, crs=out_crs, **comp_kw)
        print(f"wrote {out} shape={pred.shape}")
        return

    if args.mode == "sweep":
        # multi-scene sweep (BASELINE config #5, the per-state DE/MD/PA/…
        # workload): one engine, scenes pipelined through the 3-stage
        # predict_scenes path (stage H2D / dispatch / D2H on threads) —
        # the reference ran this on an adaptive 2-24-worker Dask cluster
        # with per-chunk model re-downloads (utils/pc_tools.py:564-729)
        import glob as _glob
        import os
        import time

        if os.path.isdir(args.input):
            paths = sorted(
                p for p in _glob.glob(os.path.join(args.input, "*"))
                if p.endswith((".npy", ".tif", ".tiff"))
            )
        else:
            paths = sorted(_glob.glob(args.input))
        if args.shard_count < 1 or not (0 <= args.shard_index < args.shard_count):
            sys.exit(f"--shard-index {args.shard_index} must be in "
                     f"[0, --shard-count {args.shard_count}) — indices are "
                     "0-based; overlapping shards would double-predict files")
        if args.shard_count > 1:
            paths = paths[args.shard_index::args.shard_count]
        if not paths:
            sys.exit(f"no scenes match {args.input!r}"
                     + (f" for shard {args.shard_index}/{args.shard_count}"
                        if args.shard_count > 1 else ""))
        # the engine culls with ONE nodata value; honor the input files'
        # GDAL_NODATA tags (as scene mode does) when --nodata is absent,
        # refusing mixed tags rather than culling some scenes wrongly
        nodata = args.nodata
        if nodata is None:
            from satellite_computervision_tpu.geo import GeoTiffScene

            tags = {p: GeoTiffScene(p).nodata
                    for p in paths if p.endswith((".tif", ".tiff"))}
            values = {v for v in tags.values() if v is not None}
            if len(values) > 1:
                sys.exit(f"mixed GDAL_NODATA tags across the sweep "
                         f"({sorted(values)}); pass an explicit --nodata")
            if values:
                nodata = values.pop()
                print(f"nodata={nodata} (from the inputs' GDAL_NODATA tags)")
        if args.bucket and args.max_rows is not None:
            print("note: --bucket is a no-op with --max-rows — banded "
                  "bands already pad to chip-grid multiples, so scene "
                  "widths share programs per kernel-sized bucket")
        outdir = args.outdir or "predictions"
        os.makedirs(outdir, exist_ok=True)
        kernel, buffer, batch, tile_mode, source = resolve_serving_geometry(
            cfg, args, args.ckpt)
        print(f"sweep: {len(paths)} scenes, geometry k{kernel}+b{buffer} "
              f"batch {batch} tile_mode={tile_mode} ({source})")
        engine = TiledInferenceEngine(
            predict, kernel=kernel, buffer=buffer, batch_size=batch,
            out_channels=cfg.num_classes, blend=args.blend,
            tile_mode=tile_mode, max_rows=args.max_rows, nodata=nodata,
            output_transform=(lambda p: (p * 255.0).astype(jnp.uint8))
            if args.uint8 else None,
            whole_multiple=whole_mult,
        )
        t0 = time.monotonic()
        mpix = 0.0
        written = []

        # same-stem inputs of different formats (de.npy + de.tif) must not
        # collide on one output — disambiguate those with the extension
        stems = [os.path.splitext(os.path.basename(p))[0] for p in paths]
        dup_stems = {s for s in stems if stems.count(s) > 1}

        def out_path(p):
            stem, ext = os.path.splitext(os.path.basename(p))
            if stem in dup_stems:
                stem = f"{stem}_{ext.lstrip('.')}"
            return os.path.join(outdir, f"{stem}_pred.tif")

        def geo_kwargs(meta):
            return dict(
                transform=tuple(args.transform) if args.transform
                else meta.get("transform"),
                crs=args.crs or meta.get("crs", ""),
            )

        if args.max_rows is not None:
            # swath-scale sweep: per-scene banded disk→disk streaming
            # (predict_scenes would stage whole scenes to the device,
            # defeating the max_rows memory bound); inputs stay lazy
            for p in paths:
                scene, meta = load_scene(p, args.max_rows)
                out = out_path(p)
                if scene.shape[0] <= args.max_rows:
                    pred = np.asarray(engine.predict_scene(scene))
                    (write_cog if args.cog else write_geotiff)(
                        out, pred, **geo_kwargs(meta), **comp_kw)
                else:
                    engine.predict_scene_to_geotiff(scene, out,
                                                    cog=args.cog,
                                                    **geo_kwargs(meta),
                                                    **comp_kw)
                h, w = scene.shape[:2]
                mpix += h * w / 1e6
                written.append(out)
                print(f"  {out} shape={(h, w, cfg.num_classes)}")
        else:
            # append-before-yield, pop-in-order (staging thread)
            metas = []  # (meta, original (h, w))

            def scene_gen():
                for p in paths:
                    scene, meta = load_scene(p)
                    metas.append((meta, scene.shape[:2]))
                    if args.bucket:
                        b = args.bucket
                        ph = -scene.shape[0] % b
                        pw = -scene.shape[1] % b
                        if ph or pw:
                            scene = np.pad(scene, ((0, ph), (0, pw), (0, 0)),
                                           mode="edge")
                    yield scene

            for path, pred in zip(
                paths, engine.predict_scenes(scene_gen(),
                                             prefetch=args.prefetch,
                                             readback=True)
            ):
                meta, (h, w) = metas.pop(0)
                pred = pred[:h, :w]
                out = out_path(path)
                (write_cog if args.cog else write_geotiff)(
                    out, pred, **geo_kwargs(meta), **comp_kw)
                mpix += pred.shape[0] * pred.shape[1] / 1e6
                written.append(out)
                print(f"  {out} shape={pred.shape}")
        dt = time.monotonic() - t0
        print(f"swept {len(written)} scenes ({mpix:.1f} MPix) in {dt:.1f}s "
              f"({mpix / max(dt, 1e-9):.2f} MPix/s end-to-end)")
        return

    # patches mode
    files, mixer_path = list_export_files(args.input)
    if not files:
        sys.exit(f"no tfrecords under {args.input!r}")
    written = run_batch_prediction(
        args.input, predict, list(cfg.bands),
        out_dir=args.outdir or "predictions",
        out_base=args.base,
        kernel_shape=(cfg.kernel_size, cfg.kernel_size),
        kernel_buffer=(cfg.kernel_buffer, cfg.kernel_buffer),
        batch_size=args.batch_size or cfg.serving_geometry[2],
    )
    print(f"wrote {len(written)} prediction tfrecords")
    if mixer_path:
        mixer = read_mixer(mixer_path)
        print(f"mixer: {mixer.total_patches} patches, "
              f"upload with: earthengine upload image --asset_id=<id> "
              f"{' '.join(written)} {mixer_path}")


if __name__ == "__main__":
    main()
