"""End-to-end CLI driver tests: train -> checkpoint -> predict."""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, "scripts")


def _write_solar_like_chips(path, n=12, k=64, seed=0):
    from satellite_computervision_tpu.data import write_tfrecord_file

    rng = np.random.default_rng(seed)
    bands = ["B2", "B3", "B4", "B8", "B11", "B12"]
    examples = []
    for _ in range(n):
        ex = {b: rng.uniform(0, 0.3, k * k).astype(np.float32) for b in bands}
        label = np.zeros((k, k), np.float32)
        label[20:36, 20:40] = 1.0
        ex["landcover"] = label.reshape(-1)
        examples.append(ex)
    write_tfrecord_file(str(path), examples)


def test_train_then_predict_cli(tmp_path, monkeypatch):
    import dataclasses

    import train as train_cli
    import predict as predict_cli

    from satellite_computervision_tpu.train import zoo
    from satellite_computervision_tpu.train.config import SOLAR_CONFIG

    # shrink the solar config for CPU speed (serve_* too: the preset's
    # measured k512 serving geometry is for the real model on real scenes)
    small = dataclasses.replace(
        SOLAR_CONFIG, kernel_size=64, kernel_buffer=32, batch_size=4,
        serve_kernel=64, serve_buffer=32, serve_batch=4,
    )
    monkeypatch.setitem(train_cli.CONFIGS, "solar", small)
    monkeypatch.setitem(predict_cli.CONFIGS, "solar", small)
    # and a small model: the train CLI builds through the zoo registry,
    # the predict CLI through models.UNet
    import satellite_computervision_tpu.models as models

    orig_unet = models.UNet

    def small_unet(**kw):
        kw.setdefault("filters", (4, 8))
        kw.setdefault("factors", (2, 2))
        return orig_unet(**kw)

    fam = zoo.FAMILIES["unet"]
    monkeypatch.setitem(
        zoo.FAMILIES, "unet",
        dataclasses.replace(
            fam, build=lambda cfg, **kw: fam.build(
                cfg, filters=(4, 8), factors=(2, 2), **kw
            )
        ),
    )
    monkeypatch.setattr(predict_cli, "UNet", small_unet)

    chips = tmp_path / "train.tfrecord"
    _write_solar_like_chips(chips)
    ckpt = str(tmp_path / "run")

    train_cli.main([
        "--config", "solar", "--train", str(chips), "--eval", str(chips),
        "--ckpt", ckpt, "--epochs", "1", "--steps-per-epoch", "2",
        "--batch-size", "4",
    ])
    assert (tmp_path / "run" / "best" / "state.msgpack").exists()

    scene = np.random.default_rng(1).uniform(0, 0.3, (160, 160, 6)).astype(np.float32)
    scene_path = tmp_path / "scene.npy"
    np.save(scene_path, scene)
    out_tif = str(tmp_path / "pred.tif")
    predict_cli.main([
        "scene", "--input", str(scene_path), "--ckpt", ckpt,
        "--config", "solar", "--output", out_tif,
        "--crs", "EPSG:32617", "--transform", "10", "0", "0", "0", "-10", "0",
        "--batch-size", "4",
    ])
    from satellite_computervision_tpu.geo import read_geotiff

    pred, meta = read_geotiff(out_tif)
    assert pred.shape == (160, 160, 1)
    assert "32617" in meta["crs"]

    # whole-scene production mode through the same CLI
    out_whole = str(tmp_path / "pred_whole.tif")
    predict_cli.main([
        "scene", "--input", str(scene_path), "--ckpt", ckpt,
        "--config", "solar", "--output", out_whole, "--tile-mode", "whole",
        "--crs", "EPSG:32617", "--transform", "10", "0", "0", "0", "-10", "0",
    ])
    pred_w, _ = read_geotiff(out_whole)
    assert pred_w.shape == (160, 160, 1)
    assert np.isfinite(pred_w).all()

    # GeoTIFF scene input: transform/crs/nodata flow from the file's tags —
    # the nodata corner culls its chips and georeferencing round-trips
    from satellite_computervision_tpu.geo import write_geotiff

    scene_nd = scene.copy()
    scene_nd[:96, :96] = 0.0
    tif_in = str(tmp_path / "scene_nodata.tif")
    write_geotiff(tif_in, scene_nd,
                  transform=(10, 0, 0, 0, -10, 0), crs="EPSG:32617", nodata=0.0)
    out_cull = str(tmp_path / "pred_cull.tif")
    predict_cli.main([
        "scene", "--input", tif_in, "--ckpt", ckpt,
        "--config", "solar", "--output", out_cull, "--batch-size", "4",
    ])
    pred_c, meta_c = read_geotiff(out_cull)
    assert pred_c.shape == (160, 160, 1)
    assert "32617" in meta_c["crs"]
    assert meta_c["transform"][0] == 10.0
    # the all-nodata chip block contributed nothing
    assert np.all(pred_c[:32, :32] == 0.0)

    # banded disk→disk streaming: --max-rows on a taller-than-band GeoTIFF
    # routes through predict_scene_to_geotiff (lazy input, streamed strip
    # output); values match the unbanded culled run
    out_stream = str(tmp_path / "pred_stream.tif")
    predict_cli.main([
        "scene", "--input", tif_in, "--ckpt", ckpt,
        "--config", "solar", "--output", out_stream, "--batch-size", "4",
        "--max-rows", "96",
    ])
    pred_s, meta_s = read_geotiff(out_stream)
    assert "32617" in meta_s["crs"]
    np.testing.assert_allclose(pred_s, pred_c, rtol=1e-5, atol=1e-5)

    # --cog + --max-rows streams tiles AND overview pyramids; LZW +
    # float predictor-3 output (GDAL's COG recipe) round-trips losslessly
    out_cogstream = str(tmp_path / "pred_stream_cog.tif")
    predict_cli.main([
        "scene", "--input", tif_in, "--ckpt", ckpt,
        "--config", "solar", "--output", out_cogstream, "--batch-size", "4",
        "--max-rows", "96", "--cog", "--compress", "lzw", "--predictor", "3",
    ])
    base_cs, _ = read_geotiff(out_cogstream, page=0)
    np.testing.assert_allclose(base_cs, pred_s, rtol=1e-6, atol=1e-7)
    # 160^2 fits one 256-tile -> no overview pages (write_cog's rule);
    # overview streaming itself is pinned in test_geo/test_inference
    with pytest.raises(IndexError):
        read_geotiff(out_cogstream, page=1)

    # standalone evaluation CLI on the same checkpoint
    import evaluate as evaluate_cli

    monkeypatch.setitem(evaluate_cli.CONFIGS, "solar", small)
    report_path = str(tmp_path / "report.json")
    evaluate_cli.main([
        "--config", "solar", "--ckpt", ckpt, "--eval", str(chips),
        "--batch-size", "4", "--out", report_path,
        "--class-names", "background", "solar",
    ])
    report = json.loads(open(report_path).read())
    assert set(report["per_class"]) == {"background", "solar"}
    counts = np.asarray(report["counts"])
    assert counts.shape == (2, 2) and counts.sum() == 12 * 64 * 64


def test_predict_patches_cli(tmp_path, monkeypatch):
    import dataclasses

    import predict as predict_cli

    from satellite_computervision_tpu.data import write_tfrecord_file
    from satellite_computervision_tpu.train.config import SOLAR_CONFIG
    from satellite_computervision_tpu.train import create_train_state, save_checkpoint
    import satellite_computervision_tpu.models as models
    import jax, jax.numpy as jnp, optax

    small = dataclasses.replace(
        SOLAR_CONFIG, kernel_size=32, kernel_buffer=16, batch_size=4
    )
    monkeypatch.setitem(predict_cli.CONFIGS, "solar", small)
    orig_unet = models.UNet

    def small_unet(**kw):
        kw.setdefault("filters", (4,))
        kw.setdefault("factors", (2,))
        return orig_unet(**kw)

    monkeypatch.setattr(predict_cli, "UNet", small_unet)

    # checkpoint
    model = small_unet(n_classes=1, head="sigmoid", threshold=0.9, dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.key(0), jnp.zeros((1, 32, 32, 6)),
                               tx=optax.adam(1e-3))
    ckpt = str(tmp_path / "run")
    save_checkpoint(f"{ckpt}/best", state, {"mean_iou": 0.5}, step=1)

    # EE-style export dir: buffered patches + mixer
    rng = np.random.default_rng(0)
    export = tmp_path / "export"
    export.mkdir()
    side = 32 + 16
    examples = [
        {b: rng.uniform(0, 0.3, side * side).astype(np.float32) for b in small.bands}
        for _ in range(4)
    ]
    write_tfrecord_file(str(export / "x-00000.tfrecord"), examples)
    (export / "x-mixer.json").write_text(json.dumps({
        "totalPatches": 4, "patchesPerRow": 2, "patchDimensions": [32, 32],
        "projection": {"affine": {"doubleMatrix": [10, 0, 0, 0, -10, 0]},
                       "crs": "EPSG:32617"},
    }))

    predict_cli.main([
        "patches", "--input", str(export), "--ckpt", ckpt, "--config", "solar",
        "--outdir", str(tmp_path / "preds"), "--base", "demo", "--batch-size", "2",
    ])
    out = list((tmp_path / "preds").glob("demo-*.tfrecords"))
    assert len(out) == 1


def test_predict_sweep_cli(tmp_path, monkeypatch):
    """sweep mode: a directory of scenes rides one pipelined engine into
    per-scene GeoTIFFs with each file's own georeferencing; --shard-*
    splits the list round-robin (the multi-state states→hosts mapping,
    utils/pc_tools.py:564-618)."""
    import dataclasses

    import predict as predict_cli

    from satellite_computervision_tpu.geo import read_geotiff, write_geotiff
    from satellite_computervision_tpu.train.config import SOLAR_CONFIG
    from satellite_computervision_tpu.train import create_train_state, save_checkpoint
    import satellite_computervision_tpu.models as models
    import jax, jax.numpy as jnp, optax

    small = dataclasses.replace(
        SOLAR_CONFIG, kernel_size=32, kernel_buffer=16, batch_size=4,
        serve_kernel=32, serve_buffer=16, serve_batch=4,
    )
    monkeypatch.setitem(predict_cli.CONFIGS, "solar", small)
    orig_unet = models.UNet

    def small_unet(**kw):
        kw.setdefault("filters", (4,))
        kw.setdefault("factors", (2,))
        return orig_unet(**kw)

    monkeypatch.setattr(predict_cli, "UNet", small_unet)
    model = small_unet(n_classes=1, head="sigmoid", dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.key(0), jnp.zeros((1, 32, 32, 6)),
                               tx=optax.adam(1e-3))
    ckpt = str(tmp_path / "run")
    save_checkpoint(f"{ckpt}/best", state, {"mean_iou": 0.5}, step=1)

    rng = np.random.default_rng(0)
    scenes = tmp_path / "scenes"
    scenes.mkdir()
    for i, name in enumerate(["de", "md", "pa"]):
        arr = rng.uniform(0, 0.3, (96, 96, 6)).astype(np.float32)
        write_geotiff(str(scenes / f"{name}.tif"), arr,
                      transform=(10, 0, 100 * i, 0, -10, 0), crs="EPSG:32617")
    np.save(scenes / "ny.npy",
            rng.uniform(0, 0.3, (96, 96, 6)).astype(np.float32))

    outdir = tmp_path / "sweep_out"
    predict_cli.main([
        "sweep", "--input", str(scenes), "--ckpt", ckpt, "--config", "solar",
        "--outdir", str(outdir),
    ])
    outs = sorted(p.name for p in outdir.glob("*_pred.tif"))
    assert outs == ["de_pred.tif", "md_pred.tif", "ny_pred.tif", "pa_pred.tif"]
    pred_md, meta_md = read_geotiff(str(outdir / "md_pred.tif"))
    assert pred_md.shape == (96, 96, 1)
    assert meta_md["transform"][2] == 100.0  # md.tif's own georeferencing
    assert "32617" in meta_md["crs"]

    # round-robin sharding: worker 1 of 2 takes files [1], [3] of the
    # sorted list (de.tif, md.tif, ny.npy, pa.tif)
    shard_out = tmp_path / "shard_out"
    predict_cli.main([
        "sweep", "--input", str(scenes), "--ckpt", ckpt, "--config", "solar",
        "--outdir", str(shard_out), "--shard-index", "1", "--shard-count", "2",
    ])
    assert sorted(p.name for p in shard_out.glob("*_pred.tif")) == [
        "md_pred.tif", "pa_pred.tif"]

    # swath-scale sweep: --max-rows streams each tall scene banded,
    # disk→disk; short scenes in the same sweep take one plain pass
    banded_out = tmp_path / "banded_out"
    predict_cli.main([
        "sweep", "--input", str(scenes), "--ckpt", ckpt, "--config", "solar",
        "--outdir", str(banded_out), "--max-rows", "64",
    ])
    pred_md_banded, meta_b = read_geotiff(str(banded_out / "md_pred.tif"))
    np.testing.assert_allclose(pred_md_banded, pred_md, rtol=1e-5, atol=1e-5)
    assert meta_b["transform"][2] == 100.0
    # tall .npy scenes ride the banded path too (memory-mapped)
    pred_ny_banded, _ = read_geotiff(str(banded_out / "ny_pred.tif"))
    pred_ny, _ = read_geotiff(str(outdir / "ny_pred.tif"))
    np.testing.assert_allclose(pred_ny_banded, pred_ny, rtol=1e-5, atol=1e-5)

    # a corrupt scene mid-sweep surfaces the error (earlier outputs stay,
    # no hang on the staging thread)
    (scenes / "zz_corrupt.npy").write_bytes(b"not an npy")
    with pytest.raises(Exception):
        predict_cli.main([
            "sweep", "--input", str(scenes), "--ckpt", ckpt, "--config",
            "solar", "--outdir", str(tmp_path / "err_out"),
        ])
    assert (tmp_path / "err_out" / "de_pred.tif").exists()
    (scenes / "zz_corrupt.npy").unlink()

    # sweep output equals the single-scene path on the same input
    single_out = str(tmp_path / "single.tif")
    predict_cli.main([
        "scene", "--input", str(scenes / "md.tif"), "--ckpt", ckpt,
        "--config", "solar", "--output", single_out,
    ])
    single, _ = read_geotiff(single_out)
    np.testing.assert_allclose(pred_md, single, rtol=1e-5, atol=1e-6)

    # heterogeneous sweep with --bucket: odd-shaped scenes pad (edge) to
    # one compiled shape and crop back — exact under blend=overwrite
    # (same chip grid, same edge-replicated window content)
    scenes2 = tmp_path / "scenes2"
    scenes2.mkdir()
    odd = rng.uniform(0, 0.3, (80, 70, 6)).astype(np.float32)
    np.save(scenes2 / "odd.npy", odd)
    np.save(scenes2 / "big.npy",
            rng.uniform(0, 0.3, (96, 96, 6)).astype(np.float32))
    bucket_out = tmp_path / "bucket_out"
    predict_cli.main([
        "sweep", "--input", str(scenes2), "--ckpt", ckpt, "--config", "solar",
        "--outdir", str(bucket_out), "--bucket", "96", "--blend", "overwrite",
    ])
    pred_odd, _ = read_geotiff(str(bucket_out / "odd_pred.tif"))
    assert pred_odd.shape == (80, 70, 1)
    odd_single = str(tmp_path / "odd_single.tif")
    predict_cli.main([
        "scene", "--input", str(scenes2 / "odd.npy"), "--ckpt", ckpt,
        "--config", "solar", "--output", odd_single, "--blend", "overwrite",
    ])
    want_odd, _ = read_geotiff(odd_single)
    np.testing.assert_array_equal(pred_odd, want_odd)

    # shard misconfiguration errors instead of silently overlapping
    with pytest.raises(SystemExit, match="shard-index"):
        predict_cli.main([
            "sweep", "--input", str(scenes), "--ckpt", ckpt, "--config",
            "solar", "--outdir", str(tmp_path / "bad"),
            "--shard-index", "2", "--shard-count", "2",
        ])

    # input GDAL_NODATA tags flow into sweep culling (like scene mode),
    # and same-stem inputs of different formats get disambiguated outputs
    scenes3 = tmp_path / "scenes3"
    scenes3.mkdir()
    arr_nd = rng.uniform(0.1, 0.3, (96, 96, 6)).astype(np.float32)
    arr_nd[:64, :64] = 0.0
    write_geotiff(str(scenes3 / "x.tif"), arr_nd,
                  transform=(10, 0, 0, 0, -10, 0), crs="EPSG:32617",
                  nodata=0.0)
    np.save(scenes3 / "x.npy", arr_nd)
    out3 = tmp_path / "out3"
    predict_cli.main([
        "sweep", "--input", str(scenes3), "--ckpt", ckpt, "--config",
        "solar", "--outdir", str(out3),
    ])
    assert sorted(p.name for p in out3.glob("*.tif")) == [
        "x_npy_pred.tif", "x_tif_pred.tif"]
    pred_nd, _ = read_geotiff(str(out3 / "x_tif_pred.tif"))
    # the corner covered only by the culled all-nodata chip stays zero
    assert np.all(pred_nd[:8, :8] == 0.0)

    # mixed nodata tags across a sweep are refused (one engine, one value)
    write_geotiff(str(scenes3 / "y.tif"), arr_nd,
                  transform=(10, 0, 0, 0, -10, 0), crs="EPSG:32617",
                  nodata=-1.0)
    with pytest.raises(SystemExit, match="mixed GDAL_NODATA"):
        predict_cli.main([
            "sweep", "--input", str(scenes3), "--ckpt", ckpt, "--config",
            "solar", "--outdir", str(tmp_path / "out4"),
        ])


def test_predict_change_cli(tmp_path, monkeypatch):
    """change mode: before/after scenes -> siamese tiled change map."""
    import dataclasses

    import predict as predict_cli

    from satellite_computervision_tpu.train.config import CHANGE_CONFIG
    from satellite_computervision_tpu.train import create_train_state, save_checkpoint
    from satellite_computervision_tpu.train import zoo
    import jax, jax.numpy as jnp, optax

    small = dataclasses.replace(CHANGE_CONFIG, kernel_size=32, kernel_buffer=16)
    monkeypatch.setitem(predict_cli.CONFIGS, "change", small)
    fam = zoo.FAMILIES["siamese"]
    monkeypatch.setitem(
        zoo.FAMILIES, "siamese",
        dataclasses.replace(
            fam, build=lambda cfg, **kw: fam.build(cfg, filters=(4,), factors=(2,), **kw)
        ),
    )

    model = zoo.FAMILIES["siamese"].build(small, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 32, 32, 4))
    state = create_train_state(model, jax.random.key(0), x, tx=optax.adam(1e-3),
                               model_args=(x,))
    ckpt = str(tmp_path / "run")
    save_checkpoint(f"{ckpt}/best", state, {"mean_iou": 0.5}, step=1)

    rng = np.random.default_rng(0)
    before = rng.normal(size=(96, 96, 4)).astype(np.float32)
    after = before + rng.normal(0, 0.1, before.shape).astype(np.float32)
    np.save(tmp_path / "before.npy", before)
    np.save(tmp_path / "after.npy", after)

    out_tif = str(tmp_path / "change.tif")
    predict_cli.main([
        "change", "--input-before", str(tmp_path / "before.npy"),
        "--input-after", str(tmp_path / "after.npy"),
        "--ckpt", ckpt, "--config", "change", "--output", out_tif,
        "--crs", "EPSG:32617", "--transform", "10", "0", "0", "0", "-10", "0",
        "--batch-size", "4", "--blend", "overwrite",
    ])
    from satellite_computervision_tpu.geo import read_geotiff

    pred, meta = read_geotiff(out_tif)
    assert pred.shape == (96, 96, 1)
    assert np.isfinite(pred).all()


def test_resolve_serving_geometry_precedence(tmp_path):
    """The predict CLI's serving-geometry policy: flags > cached tune
    table next to the checkpoint > preset serving geometry."""
    import argparse

    import predict as predict_cli

    from satellite_computervision_tpu.inference.tune import save_tune_table
    from satellite_computervision_tpu.inference import GeometryTiming
    from satellite_computervision_tpu.train.config import SOLAR_CONFIG

    def ns(**kw):
        base = dict(kernel=None, buffer=None, batch_size=None,
                    tile_mode="chips")
        base.update(kw)
        return argparse.Namespace(**base)

    # 3. preset default: solar's measured k512+b128 batch 16
    k, b, bs, tm, src = predict_cli.resolve_serving_geometry(
        SOLAR_CONFIG, ns(), str(tmp_path / "nockpt"))
    assert (k, b, bs, tm) == (512, 128, 16, "chips") and src == "preset"

    # 2. a cached tune table overrides the preset
    ckpt = tmp_path / "run"
    save_tune_table(str(ckpt / "tune.json"),
                    [GeometryTiming(384, 64, "chips", 3.2),
                     GeometryTiming(512, 128, "chips", 5.0)])
    k, b, bs, tm, src = predict_cli.resolve_serving_geometry(
        SOLAR_CONFIG, ns(), str(ckpt))
    assert (k, b, tm) == (384, 64, "chips") and src.startswith("tune table")

    # a whole-scene winner flips the tile mode
    save_tune_table(str(ckpt / "tune.json"),
                    [GeometryTiming(1920, 0, "whole", 2.0),
                     GeometryTiming(512, 128, "chips", 5.0)])
    _, _, _, tm, _ = predict_cli.resolve_serving_geometry(
        SOLAR_CONFIG, ns(), str(ckpt))
    assert tm == "whole"

    # 1. explicit flags beat the table AND the preset
    k, b, bs, tm, src = predict_cli.resolve_serving_geometry(
        SOLAR_CONFIG, ns(kernel=256, buffer=64, batch_size=8), str(ckpt))
    assert (k, b, bs, src) == (256, 64, 8, "flags")

    # an explicit non-default tile mode also disables the table
    _, _, _, tm, src = predict_cli.resolve_serving_geometry(
        SOLAR_CONFIG, ns(tile_mode="whole"), str(ckpt))
    assert tm == "whole" and src == "preset"


def test_load_model_stem_auto_retry(tmp_path, monkeypatch):
    """Round-5 default flip: solar trains the S2D stem from scratch, but a
    checkpoint trained with the OTHER stem must still serve — load_model
    retries the restore with the stem flipped on a structure mismatch, and
    an explicit --s2d/--no-s2d choice raises instead of silently flipping."""
    import dataclasses

    import optax
    import predict as predict_cli

    import jax
    import jax.numpy as jnp

    from satellite_computervision_tpu.models import UNet
    from satellite_computervision_tpu.train import (
        create_train_state,
        save_checkpoint,
    )
    from satellite_computervision_tpu.train.config import SOLAR_CONFIG

    small = dataclasses.replace(SOLAR_CONFIG, kernel_size=64, kernel_buffer=32)
    assert small.space_to_depth  # the preset default this test guards

    def small_unet(**kw):
        kw.setdefault("filters", (4, 8))
        kw.setdefault("factors", (2, 2))
        return UNet(**kw)

    monkeypatch.setattr(predict_cli, "UNet", small_unet)

    # a pre-flip checkpoint: plain stem under the solar config
    plain = small_unet(n_classes=1, head="sigmoid", space_to_depth=False)
    state = create_train_state(
        plain, jax.random.key(0), jnp.zeros((1, 64, 64, 6)),
        tx=optax.adam(1e-3))
    save_checkpoint(str(tmp_path / "best"), state, metrics={"mean_iou": 0.9})

    model, variables = predict_cli.load_model(small, str(tmp_path))
    assert model.space_to_depth is False  # auto-flipped to match the ckpt
    out = model.apply(variables, jnp.zeros((1, 64, 64, 6)))
    assert out["probs"].shape == (1, 64, 64, 1)

    # explicit stem choice must NOT silently flip
    with pytest.raises((ValueError, KeyError)):
        predict_cli.load_model(small, str(tmp_path), space_to_depth=True)

    # and an S2D checkpoint restores under the config default directly
    s2d = small_unet(n_classes=1, head="sigmoid", space_to_depth=True)
    state2 = create_train_state(
        s2d, jax.random.key(0), jnp.zeros((1, 64, 64, 6)),
        tx=optax.adam(1e-3))
    save_checkpoint(str(tmp_path / "s2d" / "best"), state2,
                    metrics={"mean_iou": 0.9})
    model2, _ = predict_cli.load_model(small, str(tmp_path / "s2d"))
    assert model2.space_to_depth is True


def test_evaluate_h5_published_weights_workflow(tmp_path, monkeypatch, rng):
    """The one-command published-weights check: reference .h5 -> inferred
    arch -> imported weights -> folded BN -> chip confusion report
    (reference load path: utils/model_tools.py:1128-1269). Rehearsed here
    on a synthetic reference-layout h5; the day real chips/weights exist
    this is `evaluate.py --h5 <url> --eval <chips>`."""
    import dataclasses

    import evaluate as evaluate_cli
    from test_keras_import import _synthetic_ref_unet_h5

    from satellite_computervision_tpu.data import write_tfrecord_file
    from satellite_computervision_tpu.train.config import SOLAR_CONFIG

    h5 = str(tmp_path / "published.h5")
    _synthetic_ref_unet_h5(h5, rng, bands=3, filters=(4, 8))

    small = dataclasses.replace(
        SOLAR_CONFIG, bands=("B2", "B3", "B4"), kernel_size=32,
        kernel_buffer=16, batch_size=2,
    )
    monkeypatch.setitem(evaluate_cli.CONFIGS, "solar", small)

    k = 32
    examples = []
    for _ in range(4):
        ex = {b: rng.uniform(0, 0.3, k * k).astype(np.float32)
              for b in small.bands}
        label = np.zeros((k, k), np.float32)
        label[8:20, 8:24] = 1.0
        ex["landcover"] = label.reshape(-1)
        examples.append(ex)
    chips = tmp_path / "eval.tfrecord"
    write_tfrecord_file(str(chips), examples)

    report_path = str(tmp_path / "h5_report.json")
    evaluate_cli.main([
        "--h5", h5, "--config", "solar", "--eval", str(chips),
        "--batch-size", "2", "--out", report_path,
        "--class-names", "background", "solar",
    ])
    report = json.loads(open(report_path).read())
    counts = np.asarray(report["counts"])
    assert counts.shape == (2, 2) and counts.sum() == 4 * k * k
    assert set(report["per_class"]) == {"background", "solar"}

    # --no-fold (live BN) scores identically: folding is numerics-neutral
    report2_path = str(tmp_path / "h5_report_nofold.json")
    evaluate_cli.main([
        "--h5", h5, "--config", "solar", "--eval", str(chips),
        "--batch-size", "2", "--out", report2_path, "--no-fold",
    ])
    counts2 = np.asarray(json.loads(open(report2_path).read())["counts"])
    np.testing.assert_array_equal(counts, counts2)


def test_infer_unet_arch(tmp_path, rng):
    from test_keras_import import _synthetic_ref_unet_h5

    from satellite_computervision_tpu.train.keras_import import infer_unet_arch

    h5 = str(tmp_path / "ref.h5")
    _synthetic_ref_unet_h5(h5, rng, bands=5, filters=(4, 8))
    arch = infer_unet_arch(h5)
    assert arch == {"bands": 5, "filters": (4, 8), "factors": (2, 2),
                    "convs_per_block": 1, "n_classes": 1}


def test_train_deeplab_torch_weights_warm_start(tmp_path, monkeypatch):
    """README.md:8's pretrained-ResNet DeepLab as a workflow, not just an
    API: `train.py --model deeplab --torch-weights backbone.pth` warm-
    starts the backbone (convs AND BN running stats) before training."""
    import dataclasses

    import train as train_cli
    from test_deeplab_weights import _synthetic_resnet_state_dict

    import torch
    import jax, optax

    from satellite_computervision_tpu.train import create_train_state, load_checkpoint
    from satellite_computervision_tpu.train.config import PARKING_CONFIG
    from satellite_computervision_tpu.train import zoo

    small = dataclasses.replace(
        PARKING_CONFIG, kernel_size=64, kernel_buffer=32, batch_size=2,
    )
    monkeypatch.setitem(train_cli.CONFIGS, "parking", small)
    fam = zoo.FAMILIES["deeplab"]
    monkeypatch.setitem(
        zoo.FAMILIES, "deeplab",
        dataclasses.replace(
            fam, build=lambda cfg, **kw: fam.build(
                cfg, stage_sizes=(1, 1, 1, 1), **kw)
        ),
    )

    sd = _synthetic_resnet_state_dict(stage_sizes=(1, 1, 1, 1))
    pth = str(tmp_path / "backbone.pth")
    torch.save(sd, pth)

    chips = tmp_path / "train.tfrecord"
    _write_parking_like_chips(chips, k=64)
    ckpt = str(tmp_path / "run")
    # lr ~ 0 so the single step leaves the warm-started convs measurable
    train_cli.main([
        "--config", "parking", "--model", "deeplab",
        "--train", str(chips), "--ckpt", ckpt,
        "--epochs", "1", "--steps-per-epoch", "1", "--batch-size", "2",
        "--torch-weights", pth, "--lr", "1e-12",
    ])

    import jax.numpy as jnp

    model = zoo.FAMILIES["deeplab"].build(small, dtype=jnp.bfloat16)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
        tx=optax.adam(1e-3))
    restored, _ = load_checkpoint(f"{ckpt}/best", state)
    want = np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0))
    got = np.asarray(restored.params["backbone"]["stem_conv"]["kernel"])
    np.testing.assert_allclose(got, want, atol=1e-5)

    # non-deeplab families reject the flag
    with pytest.raises(SystemExit):
        train_cli.main([
            "--config", "parking", "--model", "unet",
            "--train", str(chips), "--ckpt", ckpt, "--torch-weights", pth,
        ])


def _write_parking_like_chips(path, n=4, k=64, seed=0):
    from satellite_computervision_tpu.data import write_tfrecord_file

    rng = np.random.default_rng(seed)
    bands = ["R", "G", "B"]
    examples = []
    for _ in range(n):
        ex = {b: rng.uniform(0, 1, k * k).astype(np.float32) for b in bands}
        label = np.zeros((k, k), np.float32)
        label[10:30, 10:40] = 1.0
        ex["impervious"] = label.reshape(-1)
        examples.append(ex)
    write_tfrecord_file(str(path), examples)


def test_npy_dataset_uses_measured_training_geometry(tmp_path):
    """Generator-fed training consumes the preset's measured training
    geometry (train/config.py train_tile/train_batch): chips are cropped
    at train_tile (chip_generators cut from larger arrays at any size —
    the reference's 256^2 is an export format, not a constraint), while
    TFRecord-fed paths keep kernel_size (serialized chips can't be
    re-cut)."""
    import argparse
    import dataclasses

    import train as train_cli

    from satellite_computervision_tpu.train.config import CHANGE_CONFIG

    rng = np.random.default_rng(0)
    for i in range(4):
        np.save(tmp_path / f"b{i}.npy",
                rng.uniform(0, 3000, (4, 96, 96)).astype(np.float32))
        np.save(tmp_path / f"a{i}.npy",
                rng.uniform(0, 3000, (4, 96, 96)).astype(np.float32))
        np.save(tmp_path / f"l{i}.npy",
                (rng.uniform(size=(1, 96, 96)) > 0.7).astype(np.float32))

    cfg = dataclasses.replace(CHANGE_CONFIG, kernel_size=256,
                              train_tile=64, train_batch=2)
    assert cfg.training_geometry == (64, 2)
    args = argparse.Namespace(
        model="siamese", before=str(tmp_path / "b*.npy"),
        after=str(tmp_path / "a*.npy"), labels=str(tmp_path / "l*.npy"),
        seed=0)
    ds = train_cli._build_npy_dataset(args, cfg, cfg.training_geometry[1])
    assert ds.unet_dim == (64, 64)
    x, y = ds[0]
    assert x[0].shape == (2, 64, 64, 4)

    # unset -> falls back to the reference chip geometry
    plain = dataclasses.replace(CHANGE_CONFIG, kernel_size=96)
    assert plain.training_geometry == (96, plain.batch_size)


def test_swath_codec_sweep_demo(tmp_path):
    """The measured swath loop (examples/swath_codec_sweep.py, bench.py
    --swath) at smoke scale: LZW+predictor COGs synthesized through the
    streaming writer, served through the banded engine with overview
    calibration, streamed back out as COGs — records + summary land in
    the JSONL log and outputs are valid GeoTIFFs."""
    import json as _json
    import sys as _sys

    _sys.path.insert(0, "examples")
    from swath_codec_sweep import main as swath_main

    from satellite_computervision_tpu.geo import read_geotiff

    log = tmp_path / "swath.jsonl"
    rc = swath_main([
        "--scenes", "2", "--height", "256", "--width", "192", "--bands", "3",
        "--kernel", "64", "--buffer", "32", "--batch", "4",
        "--max-rows", "160", "--filters", "4", "8",
        "--dir", str(tmp_path), "--log", str(log), "--keep",
    ])
    assert rc == 0
    lines = [_json.loads(l) for l in log.read_text().splitlines()]
    assert len(lines) == 3  # 2 scene records + summary
    summary = lines[-1]["summary"]
    assert summary["swath_scenes"] == 2 and summary["sweep_mpix_per_s"] > 0
    for i in range(2):
        assert lines[i]["in_mb"] > 0 and lines[i]["rss_now_mb"] > 0
        pred, meta = read_geotiff(str(tmp_path / f"pred_{i}.tif"))
        assert pred.shape == (256, 192, 1) and pred.dtype == np.uint8
        assert "32617" in meta["crs"]
        # probabilities land mid-range (a tiny random-init model outputs
        # near-constant ~0.5; the pipeline contract is coverage + dtype)
        assert 1 <= pred.mean() <= 254


def test_predict_predictor_dtype_validated_at_parse_time(tmp_path, capsys):
    """--predictor/--uint8 mismatches fail in argparse, not after device
    inference inside the writer."""
    import predict as predict_cli

    for argv in (
        ["scene", "--ckpt", str(tmp_path), "--input", "x.npy",
         "--compress", "lzw", "--predictor", "2"],          # float out
        ["scene", "--ckpt", str(tmp_path), "--input", "x.npy",
         "--uint8", "--predictor", "3"],                    # int out
    ):
        with pytest.raises(SystemExit):
            predict_cli.main(argv)
        assert "predictor" in capsys.readouterr().err


def test_export_h5_cli(tmp_path, monkeypatch):
    """Train -> export -> the .h5 reads back bitwise and scores through
    evaluate --h5: the full hand-back workflow
    (scripts/export.py + train/keras_export.py), inverse of the
    reference's save_weights/load_weights channel
    (utils/model_tools.py:1178-1269)."""
    import dataclasses
    import os

    import jax

    import evaluate as evaluate_cli
    import export as export_cli
    import predict as predict_cli
    import train as train_cli

    from satellite_computervision_tpu.train import zoo
    from satellite_computervision_tpu.train.config import SOLAR_CONFIG

    small = dataclasses.replace(
        SOLAR_CONFIG, kernel_size=64, kernel_buffer=32, batch_size=4,
        serve_kernel=64, serve_buffer=32, serve_batch=4,
    )
    for cli in (train_cli, predict_cli, evaluate_cli, export_cli):
        monkeypatch.setitem(cli.CONFIGS, "solar", small)

    fam = zoo.FAMILIES["unet"]
    monkeypatch.setitem(
        zoo.FAMILIES, "unet",
        dataclasses.replace(
            fam, build=lambda cfg, **kw: fam.build(
                cfg, filters=(4, 8), factors=(2, 2), **kw
            )
        ),
    )
    import satellite_computervision_tpu.models as models

    orig_unet = models.UNet

    def small_unet(**kw):
        kw.setdefault("filters", (4, 8))
        kw.setdefault("factors", (2, 2))
        return orig_unet(**kw)

    monkeypatch.setattr(predict_cli, "UNet", small_unet)

    chips = tmp_path / "train.tfrecord"
    _write_solar_like_chips(chips)
    ckpt = str(tmp_path / "run")
    # --no-s2d: only the plain stem maps onto the reference architecture
    train_cli.main([
        "--config", "solar", "--train", str(chips), "--eval", str(chips),
        "--ckpt", ckpt, "--epochs", "1", "--steps-per-epoch", "2",
        "--batch-size", "4", "--no-s2d",
    ])

    h5 = str(tmp_path / "solar_export.h5")
    export_cli.main(["--config", "solar", "--ckpt", ckpt, "--out", h5])
    assert os.path.exists(h5)

    # bitwise: the exported file reads back as the checkpoint's tree
    from satellite_computervision_tpu.train.keras_import import (
        load_keras_unet_h5,
    )

    model, variables = predict_cli.load_model(
        small, ckpt, bf16=False, space_to_depth=False
    )
    got_p, got_s = load_keras_unet_h5(
        h5, variables["params"], variables["batch_stats"]
    )
    for want, got in (
        (variables["params"], got_p), (variables["batch_stats"], got_s),
    ):
        fw = jax.tree_util.tree_leaves(want)
        fg = jax.tree_util.tree_leaves(got)
        assert len(fw) == len(fg)
        for a, b in zip(fw, fg):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and the exported artifact scores through the published-weights path
    report_path = str(tmp_path / "export_report.json")
    evaluate_cli.main([
        "--h5", h5, "--config", "solar", "--eval", str(chips),
        "--batch-size", "4", "--out", report_path,
    ])
    counts = np.asarray(json.loads(open(report_path).read())["counts"])
    assert counts.shape == (2, 2) and counts.sum() > 0
