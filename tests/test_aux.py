"""Aux subsystems: profiling, logging, viz, stats, retry, pc/ee gating,
batch prediction, COG assembly, retrain freeze."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax


def test_timer_accumulates():
    from satellite_computervision_tpu.utils import Timer

    t = Timer()
    with t("a"):
        pass
    with t("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["a"]["total_s"] >= 0


def test_metrics_logger(tmp_path):
    from satellite_computervision_tpu.utils import MetricsLogger

    path = str(tmp_path / "m.jsonl")
    with MetricsLogger(path) as log:
        log.log(1, loss=0.5, note="x")
        log.log(2, loss=jnp.asarray(0.25))
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["loss"] == 0.5 and lines[1]["loss"] == 0.25


def test_save_rgb_image(tmp_path, rng):
    from satellite_computervision_tpu.utils import save_rgb_image

    arr = rng.integers(0, 255, (3, 16, 16)).astype(np.float32)
    out = str(tmp_path / "x.png")
    save_rgb_image(arr, out)
    from PIL import Image

    assert Image.open(out).size == (16, 16)


def test_stats_pdfs():
    from scipy.stats import gamma, lognorm

    from satellite_computervision_tpu.ops.stats import gamma_pdf, lognormal_pdf

    x = np.array([0.5, 1.0, 2.0, 5.0], np.float32)
    np.testing.assert_allclose(
        np.asarray(gamma_pdf(x, 2.0, 1.5)), gamma.pdf(x, 2.0, scale=1.5), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(lognormal_pdf(x, 0.3, 0.8)),
        lognorm.pdf(x, 0.8, scale=np.exp(0.3)),
        rtol=1e-4,
    )
    assert float(gamma_pdf(-1.0, 2.0, 1.5)) == 0.0


def test_retry_bounded():
    from satellite_computervision_tpu.cloud.pc import retry

    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("boom")
        return "ok"

    assert retry(flaky, retries=5, delay=0.001) == "ok"
    calls.clear()
    with pytest.raises(RuntimeError):
        retry(flaky, retries=2, delay=0.001)
    assert len(calls) == 2


def test_harmonize_to_old():
    from satellite_computervision_tpu.cloud.pc import harmonize_to_old

    data = np.array([500.0, 1500.0], np.float32)
    np.testing.assert_array_equal(harmonize_to_old(data, False), data)
    np.testing.assert_array_equal(harmonize_to_old(data, True), [0.0, 500.0])


def test_join_ssurgo():
    from satellite_computervision_tpu.cloud.pc import SSURGO_ATTRIBUTES, join_ssurgo

    mukey = np.array([[1, 2], [3, 1]])
    table = {"hydclprs": {1: 10.0, 2: 20.0}}
    out = join_ssurgo(mukey, table)
    assert out.shape == (2, 2, len(SSURGO_ATTRIBUTES))
    assert out[0, 0, 0] == 10.0 and out[0, 1, 0] == 20.0
    assert np.isnan(out[1, 0, 0])  # mukey 3 missing
    assert np.isnan(out[..., 1]).all()  # attribute absent entirely


def test_pc_stac_gated():
    from satellite_computervision_tpu.cloud.pc import search_stac

    with pytest.raises(ImportError):
        search_stac("naip", [0, 0, 1, 1])


def test_ee_gated():
    from satellite_computervision_tpu.cloud import ee as ee_client

    with pytest.raises(ImportError):
        ee_client.initialize()


def test_run_batch_prediction(tmp_path, rng):
    from satellite_computervision_tpu.data import write_tfrecord_file
    from satellite_computervision_tpu.data.tfrecord import read_tfrecord_file
    from satellite_computervision_tpu.inference.batch import (
        list_export_files,
        run_batch_prediction,
    )

    k, b = 8, 4
    side = k + b
    export = tmp_path / "export"
    export.mkdir()
    for fi in range(2):
        examples = [
            {band: rng.uniform(0, 1, side * side).astype(np.float32) for band in ("B2", "B3")}
            for _ in range(3)
        ]
        write_tfrecord_file(str(export / f"pred-{fi:03d}.tfrecord"), examples)
    (export / "pred-mixer.json").write_text("{}")

    files, mixer = list_export_files(str(export))
    assert len(files) == 2 and mixer.endswith(".json")

    out = run_batch_prediction(
        str(export),
        predict_fn=lambda chips: chips.mean(-1, keepdims=True),
        features=["B2", "B3"],
        out_dir=str(tmp_path / "preds"),
        out_base="demo",
        kernel_shape=(k, k),
        kernel_buffer=(b, b),
        batch_size=4,
    )
    assert len(out) == 1
    back = read_tfrecord_file(out[0], compression=None)
    assert len(back) == 6
    assert back[0]["b1"].shape == (k * k,)


def test_arrays_to_cog(tmp_path, rng):
    from satellite_computervision_tpu.geo import read_geotiff
    from satellite_computervision_tpu.geo.assembly import arrays_to_cog

    size = 16
    mixer = {"rows": 32, "cols": 32, "size": size,
             "transform": [1.0, 0, 0, 0, -1.0, 0], "crs": "EPSG:32617"}
    files = []
    tiles = {}
    for x in (0, 16):
        for y in (0, 16):
            arr = rng.normal(size=(size, size, 2)).astype(np.float32)
            f = tmp_path / f"{x}_{y}.npy"
            np.save(f, arr)
            files.append(str(f))
            tiles[(y, x)] = arr
    out = str(tmp_path / "scene.tif")
    arrays_to_cog(files, mixer, out)
    scene, meta = read_geotiff(out)
    np.testing.assert_allclose(scene[:16, 16:32], tiles[(0, 16)], rtol=1e-6)
    assert meta["nodata"] == 255.0


def test_multiclass_scene_to_cog_roundtrip(tmp_path, rng):
    """Integration: multiclass engine output -> COG -> read -> per-class
    stats (the land-cover deployment shape)."""
    import jax.numpy as jnp

    from satellite_computervision_tpu.geo import read_geotiff, write_cog
    from satellite_computervision_tpu.inference import TiledInferenceEngine
    from satellite_computervision_tpu.train.evaluate import evaluate_confusion

    nclass = 3
    scene = rng.uniform(0, 1, (160, 160, 2)).astype(np.float32)

    def predict(chips):
        # toy 3-class "model": bucket the mean band value
        score = chips.mean(-1, keepdims=True)
        return jnp.concatenate(
            [(score < 0.33), (score >= 0.33) & (score < 0.66), score >= 0.66],
            axis=-1,
        ).astype(jnp.float32)

    engine = TiledInferenceEngine(
        predict, kernel=32, buffer=16, batch_size=4, out_channels=nclass
    )
    probs = np.asarray(engine.predict_scene(scene))
    classes = probs.argmax(-1).astype(np.uint8)

    out = str(tmp_path / "landcover.tif")
    write_cog(out, classes, transform=(10, 0, 0, 0, -10, 0), crs="EPSG:32617")
    back, meta = read_geotiff(out)
    np.testing.assert_array_equal(back[..., 0], classes)

    truth = np.digitize(scene.mean(-1), [0.33, 0.66])
    report = evaluate_confusion(lambda x: back[None, ..., 0], [(None, truth[None])], nclass)
    assert report["overall"]["accuracy"] > 0.95


def test_retrain_freeze_and_resume(tmp_path, rng):
    from satellite_computervision_tpu.models import UNet, losses
    from satellite_computervision_tpu.train import create_train_state, save_checkpoint
    from satellite_computervision_tpu.train.retrain import retrain

    model = UNet(n_classes=1, filters=(4,), factors=(2,), head="sigmoid")
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 16, 16, 2)), tx=optax.adam(1e-2)
    )
    save_checkpoint(str(tmp_path / "c"), state, {"mean_iou": 0.4}, step=5)

    x = rng.normal(size=(2, 16, 16, 2)).astype(np.float32)
    y = (x[..., :1] > 0).astype(np.float32)
    loss_fn = lambda t, p: losses.weighted_bce(t, p, pos_weight=1.0, logits=True)

    trainer = retrain(
        state, loss_fn,
        checkpoint_path=str(tmp_path / "c"),
        eval_iter=[(x, y)],
        learning_rate=1e-3,
        freeze_to="head",
    )
    # resume seeds the best-metric baseline from a fresh evaluation
    # (utils/model_tools.py:1164-1168)
    assert np.isfinite(trainer.best)
    before = jax.device_get(trainer.state.params)
    for _ in range(3):
        trainer.state, _ = trainer.train_step(trainer.state, (x, y), jax.random.key(1))
    after = jax.device_get(trainer.state.params)
    # head updated, encoder frozen
    head_moved = not np.allclose(before["head"]["kernel"], after["head"]["kernel"])
    frozen_names = [k for k in before if k != "head"]
    frozen_same = all(
        np.allclose(a, b)
        for k in frozen_names
        for a, b in zip(
            jax.tree_util.tree_leaves(before[k]), jax.tree_util.tree_leaves(after[k])
        )
    )
    assert head_moved and frozen_same
