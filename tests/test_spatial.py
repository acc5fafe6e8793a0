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

def test_spatial_hann_matches_engine_hann(rng):
    """Sharded hann (halo chip rows over ppermute, phantom-row masking,
    sharded global normalizer) must reproduce the single-device engine's
    hann blend — same chip set, same quadrant math, same normalizer."""
    mesh = make_mesh([("data", 8)])
    k, b = 32, 16

    def avg3(x):
        out = x
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy or dx:
                    out = out + jnp.roll(x, (dy, dx), axis=(1, 2))
        return out[..., :1] / 9.0

    scene = rng.normal(size=(16 * k + 13, 3 * k + 7, 2)).astype(np.float32)
    spatial = make_spatial_inference(
        avg3, mesh, axis="data", kernel=k, buffer=b, blend="hann", batch_size=8,
    )
    got = np.asarray(spatial(scene))

    engine = TiledInferenceEngine(
        avg3, kernel=k, buffer=b, batch_size=8, out_channels=1,
        blend="hann", index_mode="grid",
    )
    want = np.asarray(engine.predict_scene(scene))
    assert got.shape == want.shape == scene.shape[:2] + (1,)
    # bitwise: same chip predictions, same quadrant summation order, same
    # normalizer constant (measured max diff 0.0 on the CPU mesh)
    np.testing.assert_array_equal(got, want)


def test_spatial_hann_fused_transforms_match_engine(rng):
    """uint16-in / uint8-out fusion on the sharded hann path: identical
    output bytes to the engine's fused program."""
    mesh = make_mesh([("data", 4)], devices=jax.devices()[:4])
    k, b = 32, 16
    pre = lambda s: s.astype(jnp.float32) / 10000.0
    post = lambda p: (p * 255.0).astype(jnp.uint8)
    scene = rng.integers(0, 10000, (8 * k + 5, 2 * k + 3, 3)).astype(np.uint16)

    spatial = make_spatial_inference(
        _mean_model, mesh, axis="data", kernel=k, buffer=b, blend="hann",
        batch_size=4, preprocess_fn=pre, output_transform=post,
    )
    got = np.asarray(spatial(scene))
    assert got.dtype == np.uint8

    engine = TiledInferenceEngine(
        _mean_model, kernel=k, buffer=b, batch_size=4, out_channels=1,
        blend="hann", index_mode="grid", preprocess_fn=pre, output_transform=post,
    )
    want = np.asarray(engine.predict_scene(scene))
    # float32 parity is ~1 ulp (see the float test above); the uint8 cast
    # truncates, so values landing ON an integer boundary may flip by one
    # quantization step between program partitions
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


def test_spatial_banded_hann_matches_unbanded(rng):
    """max_rows streams a tall scene through the mesh in bands; halo chip
    rows make every kept pixel's chip set complete, so banded == whole."""
    mesh = make_mesh([("data", 4)], devices=jax.devices()[:4])
    k, b = 32, 16

    def avg3(x):
        out = x
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy or dx:
                    out = out + jnp.roll(x, (dy, dx), axis=(1, 2))
        return out[..., :1] / 9.0

    scene = rng.normal(size=(24 * k + 9, 2 * k, 2)).astype(np.float32)
    whole = make_spatial_inference(
        avg3, mesh, axis="data", kernel=k, buffer=b, blend="hann", batch_size=4,
    )
    banded = make_spatial_inference(
        avg3, mesh, axis="data", kernel=k, buffer=b, blend="hann", batch_size=4,
        max_rows=12 * k,
    )
    np.testing.assert_allclose(
        np.asarray(banded(scene)), np.asarray(whole(scene)), rtol=1e-6, atol=1e-6
    )


def test_spatial_banded_overwrite_matches_unbanded(rng):
    mesh = make_mesh([("data", 4)], devices=jax.devices()[:4])
    k, b = 32, 16

    def avg3(x):
        out = x
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy or dx:
                    out = out + jnp.roll(x, (dy, dx), axis=(1, 2))
        return out[..., :1] / 9.0

    scene = rng.normal(size=(24 * k + 9, 2 * k, 2)).astype(np.float32)
    whole = make_spatial_inference(
        avg3, mesh, axis="data", kernel=k, buffer=b, batch_size=4,
    )
    banded = make_spatial_inference(
        avg3, mesh, axis="data", kernel=k, buffer=b, batch_size=4, max_rows=12 * k,
    )
    np.testing.assert_allclose(
        np.asarray(banded(scene)), np.asarray(whole(scene)), rtol=1e-6, atol=1e-6
    )
