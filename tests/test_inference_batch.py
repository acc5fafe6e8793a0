import numpy as np
import pytest

from satellite_computervision_tpu.inference import TiledInferenceEngine


def _mean_model(chips):
    return chips.mean(axis=-1, keepdims=True)


def test_predict_scene_batch_matches_single(rng):
    scenes = rng.normal(size=(3, 160, 160, 2)).astype(np.float32)
    eng = TiledInferenceEngine(_mean_model, kernel=32, buffer=16, batch_size=4, out_channels=1)
    batched = np.asarray(eng.predict_scene_batch(scenes))
    for i in range(3):
        single = np.asarray(eng.predict_scene(scenes[i]))
        np.testing.assert_allclose(batched[i], single, rtol=1e-5, atol=1e-6)


def test_output_transform_uint8(rng):
    import jax.numpy as jnp

    scenes = rng.uniform(0, 1, (2, 96, 96, 2)).astype(np.float32)
    eng = TiledInferenceEngine(
        _mean_model, kernel=32, buffer=16, batch_size=4, out_channels=1,
        output_transform=lambda p: (p * 255.0).astype(jnp.uint8),
    )
    out = np.asarray(eng.predict_scene_batch(scenes))
    assert out.dtype == np.uint8
    want = np.asarray(_mean_model(scenes[0]) * 255.0).astype(np.uint8)
    half = 8
    np.testing.assert_array_equal(
        out[0, half:-half, half:-half], want[half:-half, half:-half]
    )


def test_preprocess_can_add_derived_bands(rng):
    """preprocess_fn may append on-device derived bands (e.g. NDVI): the
    engine gathers from the widened scene."""
    import jax.numpy as jnp

    scene = rng.uniform(0.1, 0.9, (96, 96, 2)).astype(np.float32)

    def with_ndvi(s):
        ndvi = (s[..., 1:2] - s[..., 0:1]) / (s[..., 1:2] + s[..., 0:1] + 1e-8)
        return jnp.concatenate([s, ndvi], axis=-1)

    eng = TiledInferenceEngine(
        lambda c: c[..., 2:3],  # returns the derived band
        kernel=32, buffer=16, batch_size=4, out_channels=1,
        preprocess_fn=with_ndvi,
    )
    out = np.asarray(eng.predict_scene(scene))
    want = np.asarray(with_ndvi(scene))[..., 2:3]
    half = 8
    np.testing.assert_allclose(
        out[half:-half, half:-half], want[half:-half, half:-half], rtol=1e-4, atol=1e-5
    )


def test_predict_scenes_stream_order(rng):
    scenes = [rng.normal(size=(96, 96, 2)).astype(np.float32) for _ in range(4)]
    # tag each scene so order is observable
    for i, s in enumerate(scenes):
        s[0, 0, 0] = float(i + 1) * 100.0
    eng = TiledInferenceEngine(
        lambda c: c.mean(-1, keepdims=True) * 0 + c[:, :1, :1, :1].mean(),
        kernel=32, buffer=16, batch_size=4, out_channels=1,
    )
    outs = list(eng.predict_scenes(iter(scenes), prefetch=2))
    assert len(outs) == 4
    # outputs arrive in input order (prefetch must not reorder)
    means = [float(np.asarray(o).mean()) for o in outs]
    assert means == sorted(means)

    # 3-stage form (threaded D2H readback, the bench/production path):
    # same values, already-materialized numpy, same order
    outs3 = list(eng.predict_scenes(iter(scenes), prefetch=2, readback=True))
    assert len(outs3) == 4 and all(isinstance(o, np.ndarray) for o in outs3)
    for a, b in zip(outs, outs3):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-6)


def test_predict_scenes_readback_propagates_errors(rng):
    """A model error inside the dispatch thread must re-raise in the
    consumer, not hang or truncate the stream silently."""
    def boom(chips):
        raise RuntimeError("model exploded")

    eng = TiledInferenceEngine(boom, kernel=32, buffer=16, batch_size=4,
                               out_channels=1)
    scenes = [rng.normal(size=(96, 96, 2)).astype(np.float32)]
    with pytest.raises(RuntimeError, match="model exploded"):
        list(eng.predict_scenes(iter(scenes), readback=True))


@pytest.mark.parametrize("readback", [False, True])
def test_predict_scenes_early_abandonment_releases_threads(rng, readback):
    """Closing the output generator after one item must drain and release
    the staging/dispatch daemon threads (they otherwise block forever
    holding device-resident scenes)."""
    import threading
    import time

    eng = TiledInferenceEngine(_mean_model, kernel=32, buffer=16,
                               batch_size=4, out_channels=1)
    scenes = [rng.normal(size=(96, 96, 2)).astype(np.float32) for _ in range(6)]
    before = {t.ident for t in threading.enumerate()}
    gen = eng.predict_scenes(iter(scenes), prefetch=2, readback=readback)
    next(gen)
    gen.close()  # abandon with 5 scenes unconsumed
    deadline = time.time() + 10.0
    while time.time() < deadline:
        leaked = [
            t for t in threading.enumerate()
            if t.ident not in before and t.is_alive()
        ]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"daemon threads still alive after close(): {leaked}"


def test_engine_shape_fuzz(rng):
    """Randomized shapes/modes: output shape always matches, no crashes,
    interior matches the pointwise model."""
    for trial in range(6):
        k = int(rng.choice([16, 32]))
        b = int(rng.choice([8, 16]))
        if b > k:
            continue
        h = int(rng.integers(k + b + 1, 150))
        w = int(rng.integers(k + b + 1, 150))
        c = int(rng.integers(1, 4))
        blend = str(rng.choice(["overwrite", "hann"]))
        tile_mode = str(rng.choice(["chips", "whole"]))
        scene = rng.normal(size=(h, w, c)).astype(np.float32)
        eng = TiledInferenceEngine(
            _mean_model, kernel=k, buffer=b, batch_size=3,
            out_channels=1, blend=blend, tile_mode=tile_mode, whole_multiple=8,
        )
        out = np.asarray(eng.predict_scene(scene))
        assert out.shape == (h, w, 1), (trial, k, b, h, w, blend, tile_mode)
        half = b // 2
        want = scene.mean(-1, keepdims=True)
        np.testing.assert_allclose(
            out[half:-half, half:-half],
            want[half:-half, half:-half],
            rtol=1e-3, atol=1e-4,
            err_msg=f"trial {trial}: k={k} b={b} h={h} w={w} {blend} {tile_mode}",
        )


def test_preprocess_uint16_input(rng):
    import jax.numpy as jnp

    u16 = rng.integers(0, 10000, (96, 96, 3)).astype(np.uint16)
    eng = TiledInferenceEngine(
        _mean_model, kernel=32, buffer=16, batch_size=4, out_channels=1,
        preprocess_fn=lambda s: s.astype(jnp.float32) / 10000.0,
    )
    out = np.asarray(eng.predict_scene(u16))
    want = np.asarray(_mean_model((u16.astype(np.float32) / 10000.0)[None])[0])
    half = 8
    np.testing.assert_allclose(
        out[half:-half, half:-half], want[half:-half, half:-half], rtol=1e-5
    )
