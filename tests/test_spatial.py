"""Spatially sharded inference over the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from satellite_computervision_tpu.inference import TiledInferenceEngine
from satellite_computervision_tpu.parallel import make_mesh
from satellite_computervision_tpu.parallel.spatial import make_spatial_inference


def _mean_model(chips):
    return chips.mean(axis=-1, keepdims=True)


def test_spatial_matches_single_device(rng):
    """Row-sharded halo-exchange inference must equal the single-device
    grid engine over the interior (both see full conv context there)."""
    assert len(jax.devices()) == 8
    mesh = make_mesh([("data", 8)])
    k, b = 32, 16
    scene = rng.normal(size=(8 * 2 * k, 3 * k + 7, 3)).astype(np.float32)

    spatial = make_spatial_inference(_mean_model, mesh, axis="data", kernel=k, buffer=b)
    got = np.asarray(spatial(scene))

    engine = TiledInferenceEngine(
        _mean_model, kernel=k, buffer=b, batch_size=8, out_channels=1, index_mode="grid"
    )
    want = np.asarray(engine.predict_scene(scene))

    assert got.shape == want.shape == scene.shape[:2] + (1,)
    # identical everywhere: the mean model is pointwise, halos irrelevant
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_spatial_whole_band_matches_engine_whole(rng):
    """tile_mode='whole' on the mesh: each device one fully-conv forward
    over its haloed band; for a pointwise model it equals the
    single-device whole-scene engine exactly."""
    mesh = make_mesh([("data", 8)])
    k, b = 32, 16
    scene = rng.normal(size=(8 * 2 * k, 3 * k + 7, 3)).astype(np.float32)

    spatial = make_spatial_inference(
        _mean_model, mesh, axis="data", kernel=k, buffer=b, tile_mode="whole",
        whole_multiple=8,
    )
    got = np.asarray(spatial(scene))

    engine = TiledInferenceEngine(
        _mean_model, kernel=k, buffer=b, out_channels=1,
        tile_mode="whole", whole_multiple=8,
    )
    want = np.asarray(engine.predict_scene(scene))
    assert got.shape == want.shape == scene.shape[:2] + (1,)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_spatial_whole_band_halo_continuity(rng):
    """Whole-band forwards with a spatial-support model: band boundaries
    must be seamless (halos supply the conv context across devices)."""
    mesh = make_mesh([("data", 4)], devices=jax.devices()[:4])
    k, b = 32, 16

    def avg3(x):
        out = x
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy or dx:
                    out = out + jnp.roll(x, (dy, dx), axis=(1, 2))
        return out[..., :1] / 9.0

    scene = rng.normal(size=(4 * k, 2 * k, 2)).astype(np.float32)
    spatial = make_spatial_inference(
        avg3, mesh, axis="data", kernel=k, buffer=b, tile_mode="whole",
        whole_multiple=8,
    )
    got = np.asarray(spatial(scene))
    engine = TiledInferenceEngine(
        avg3, kernel=k, buffer=b, out_channels=1, tile_mode="whole", whole_multiple=8
    )
    want = np.asarray(engine.predict_scene(scene))
    # interior rows see identical context (roll wraps differ only at the
    # global scene edge, which the engine pads identically)
    np.testing.assert_allclose(got[1:-1, 1:-1], want[1:-1, 1:-1], rtol=1e-4, atol=1e-5)


def test_spatial_halo_continuity(rng):
    """A model with spatial support (local averaging) must produce smooth
    results across device-band boundaries — halos really flow over the
    mesh. Compare against the same model run single-device."""
    mesh = make_mesh([("data", 4)], devices=jax.devices()[:4])
    k, b = 32, 16

    def avg3(chips):
        # 3x3 box filter via shifts (needs neighbor context)
        out = chips
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy or dx:
                    out = out + jnp.roll(chips, (dy, dx), axis=(1, 2))
        return out[..., :1] / 9.0

    scene = rng.normal(size=(4 * k, 2 * k, 2)).astype(np.float32)
    spatial = make_spatial_inference(avg3, mesh, axis="data", kernel=k, buffer=b)
    got = np.asarray(spatial(scene))

    engine = TiledInferenceEngine(
        avg3, kernel=k, buffer=b, batch_size=4, out_channels=1, index_mode="grid"
    )
    want = np.asarray(engine.predict_scene(scene))
    # interior parity (edges differ only by padding treatment inside chips)
    np.testing.assert_allclose(got[2:-2, 2:-2], want[2:-2, 2:-2], rtol=1e-4, atol=1e-5)
