"""Geometry auto-tuner (inference/tune.py).

The reference pins one chip geometry per project
(utils/prediction_tools.py:87-131); on TPU geometry is a measured
serving-time choice. These tests run tiny scenes on the CPU mesh — the
contract under test is candidate generation, measurement plumbing, and
that every candidate engine computes the same function.
"""

import numpy as np
import pytest

from satellite_computervision_tpu.inference import (
    GeometryTiming,
    TiledInferenceEngine,
    candidate_geometries,
    tune_engine_geometry,
)


def _mean_model(chips):
    return chips.mean(axis=-1, keepdims=True)


def test_candidate_geometries_constraints():
    cands = candidate_geometries((1920, 1920), chip_multiple=32)
    assert cands, "expected candidates for a production-size scene"
    for kernel, buffer in cands:
        assert (kernel + buffer) % 32 == 0
        assert buffer <= kernel
        assert kernel <= 1920
    # the measured v5e sweet spot must be in the default sweep
    assert (512, 128) in cands and (512, 64) in cands


def test_candidate_geometries_small_scene_fallback():
    cands = candidate_geometries((96, 96), chip_multiple=32)
    assert cands
    for kernel, buffer in cands:
        assert kernel <= 96
        assert buffer % 2 == 0


def test_tuner_returns_ranked_rows_and_working_engine(rng):
    scene = rng.normal(size=(192, 192, 3)).astype(np.float32)
    engine, rows = tune_engine_geometry(
        _mean_model,
        scene.shape,
        np.float32,
        candidates=[(64, 32), (96, 32), (64, 64)],
        chip_multiple=32,
        batch_size=4,
        reps=1,
        scene=scene,
    )
    # one row per candidate + the whole-scene mode (192 % 32 == 0)
    assert len(rows) == 4
    assert [r.ms for r in rows] == sorted(r.ms for r in rows)
    assert isinstance(engine, TiledInferenceEngine)
    # winner metadata matches the returned engine
    best = rows[0]
    if best.tile_mode == "whole":
        assert engine.tile_mode == "whole"
    else:
        assert (engine.kernel, engine.buffer) == (best.kernel, best.buffer)
    # per-pixel model: every geometry computes the identity function, so
    # the tuned engine must reproduce the scene mean everywhere
    got = np.asarray(engine.predict_scene(scene))
    np.testing.assert_allclose(
        got[..., 0], scene.mean(-1), rtol=1e-5, atol=1e-5
    )


def test_tuner_candidates_all_compute_same_function(rng):
    """Geometry must be a pure serving choice: for a per-pixel (hence
    fully convolutional) model, all candidate engines agree exactly."""
    scene = rng.normal(size=(128, 160, 2)).astype(np.float32)
    want = scene.mean(-1)
    for kernel, buffer in [(32, 32), (64, 32), (96, 32)]:
        engine = TiledInferenceEngine(
            _mean_model, kernel=kernel, buffer=buffer, batch_size=4,
            out_channels=1, blend="hann", index_mode="grid",
        )
        got = np.asarray(engine.predict_scene(scene))
        np.testing.assert_allclose(got[..., 0], want, rtol=1e-5, atol=1e-5)


def test_tuner_skips_whole_mode_on_unaligned_scene(rng):
    scene = rng.normal(size=(100, 100, 1)).astype(np.float32)
    _, rows = tune_engine_geometry(
        _mean_model,
        scene.shape,
        np.float32,
        candidates=[(32, 16)],
        chip_multiple=32,
        batch_size=2,
        reps=1,
    )
    assert all(r.tile_mode == "chips" for r in rows)


def test_geometry_timing_labels():
    assert GeometryTiming(512, 128, "chips", 1.0).label() == "k512+b128"
    assert GeometryTiming(1920, 0, "whole", 1.0).label() == "whole-scene"


def test_tune_table_roundtrip_and_from_model(tmp_path, rng):
    """The cached-tune-table serving path (predict --tune persists the
    measured table next to the checkpoint; later serves consult it)."""
    import jax
    import jax.numpy as jnp

    from satellite_computervision_tpu.inference.tune import (
        load_tune_table,
        save_tune_table,
    )
    from satellite_computervision_tpu.models import UNet
    from satellite_computervision_tpu.train import create_train_state

    rows = [
        GeometryTiming(256, 128, "chips", 9.0),
        GeometryTiming(512, 128, "chips", 4.5),
        GeometryTiming(640, 0, "whole", 6.0),
    ]
    table = tmp_path / "ckpt" / "tune.json"
    save_tune_table(str(table), rows)
    loaded = load_tune_table(str(table))
    assert [r.ms for r in loaded] == [4.5, 6.0, 9.0]  # best first
    assert loaded[0] == GeometryTiming(512, 128, "chips", 4.5)

    model = UNet(n_classes=1, filters=(4,), factors=(2,), head="sigmoid")
    state = create_train_state(model, jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # geometry="tuned" + an existing table -> the measured best row
    eng = TiledInferenceEngine.from_model(
        model, variables, geometry="tuned", tune_table=str(table))
    assert (eng.kernel, eng.buffer, eng.tile_mode) == (512, 128, "chips")

    # a whole-scene winner switches the tile mode instead
    save_tune_table(str(table), [GeometryTiming(640, 0, "whole", 2.0)] + rows)
    eng = TiledInferenceEngine.from_model(
        model, variables, geometry="tuned", tune_table=str(table))
    assert eng.tile_mode == "whole"

    # missing table: "tuned" falls back to the explicit kwargs (safe to
    # request unconditionally)
    eng = TiledInferenceEngine.from_model(
        model, variables, geometry="tuned",
        tune_table=str(tmp_path / "nope.json"), kernel=96, buffer=32)
    assert (eng.kernel, eng.buffer) == (96, 32)

    # explicit (kernel, buffer) tuple form
    eng = TiledInferenceEngine.from_model(model, variables, geometry=(128, 64))
    assert (eng.kernel, eng.buffer) == (128, 64)


def test_preset_serving_geometry_defaults():
    """Presets carry the measured serving geometry (solar: the v5e-benched
    k512 grid, ~2x the k256 training geometry); unmeasured presets fall
    back to their training geometry."""
    from satellite_computervision_tpu.train.config import CONFIGS

    assert CONFIGS["solar"].serving_geometry == (512, 128, 16)
    ch = CONFIGS["change"]
    assert ch.serving_geometry == (ch.kernel_size, ch.kernel_buffer, ch.batch_size)

    # training geometry: solar carries the measured batch-64 winner
    # (bench.py --probe-traingeo: 17.4% MFU vs 12.1% at batch 16; tile
    # stays the 256^2 export size — bigger tiles measured WORSE at equal
    # batch); unmeasured presets fall back to the reference config
    assert CONFIGS["solar"].training_geometry == (256, 64)
    assert ch.training_geometry == (ch.kernel_size, ch.batch_size)
