import numpy as np
import pytest

from satellite_computervision_tpu.inference import (
    MixerInfo,
    TiledInferenceEngine,
    reassemble_patches,
    write_tfrecord_predictions,
)
from satellite_computervision_tpu.inference.mixer import read_mixer, write_mixer
from satellite_computervision_tpu.data.tfrecord import read_tfrecord_file


def _mean_model(chips):
    """Toy 'model': per-pixel mean over input channels, keepdims."""
    return chips.mean(axis=-1, keepdims=True)


def test_engine_matches_reference_loop(rng):
    """The fused engine must produce exactly what the reference's per-chip
    batch-1 loop produces (utils/prediction_tools.py:133-156) given the
    same model and reference-mode indices."""
    scene = rng.normal(size=(700, 650, 3)).astype(np.float32)
    k, b = 128, 64
    engine = TiledInferenceEngine(
        _mean_model, kernel=k, buffer=b, batch_size=4, out_channels=1,
        blend="sum", index_mode="reference",
    )
    got = np.asarray(engine.predict_scene(scene))

    half = b // 2
    template = np.zeros((700, 650), np.float32)
    side = k + b
    ys = list(range(half, 700 - side, k))
    xs = list(range(half, 650 - side, k))
    for y in ys:
        for x in xs:
            chip = scene[y - half : y + k + half, x - half : x + k + half, :]
            pred = chip.mean(-1)
            template[y : y + k, x : x + k] += pred[half : half + k, half : half + k]
    np.testing.assert_allclose(got[..., 0], template, rtol=1e-5, atol=1e-5)


def test_engine_cover_mode_full_interior(rng):
    scene = rng.normal(size=(400, 400, 2)).astype(np.float32)
    k, b = 64, 32
    engine = TiledInferenceEngine(
        _mean_model, kernel=k, buffer=b, batch_size=8, out_channels=1, blend="overwrite"
    )
    got = np.asarray(engine.predict_scene(scene))
    half = b // 2
    want = scene.mean(-1, keepdims=True)
    np.testing.assert_allclose(got[half:-half, half:-half], want[half:-half, half:-half], rtol=1e-5)


def test_engine_whole_scene_mode(rng):
    """tile_mode='whole' runs the model over the whole padded scene: for a
    per-pixel model it equals the scene exactly (any shape, incl. ones not
    divisible by whole_multiple); preprocess/output_transform still fuse."""
    scene = rng.normal(size=(70, 91, 3)).astype(np.float32)
    engine = TiledInferenceEngine(
        _mean_model, kernel=32, buffer=16, batch_size=4, out_channels=1,
        tile_mode="whole", whole_multiple=8,
        preprocess_fn=lambda s: s * 2.0,
        output_transform=lambda p: p + 1.0,
    )
    got = np.asarray(engine.predict_scene(scene))
    assert got.shape == (70, 91, 1)
    np.testing.assert_allclose(
        got, scene.mean(-1, keepdims=True) * 2.0 + 1.0, rtol=1e-5, atol=1e-5
    )
    # batch form vmaps the same program
    stack = np.stack([scene, scene * 0.5])
    got2 = np.asarray(engine.predict_scene_batch(stack))
    np.testing.assert_allclose(got2[0], got, rtol=1e-5, atol=1e-5)


def test_engine_whole_scene_banded_matches_whole(rng):
    """Banded whole-scene streaming (scenes > HBM without chips): bands
    carry real buffer/2 context, so any model whose receptive field fits
    the halo matches the unbanded whole-scene pass exactly."""
    import jax.numpy as jnp

    def avg3(x):
        out = x
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy or dx:
                    out = out + jnp.roll(x, (dy, dx), axis=(1, 2))
        return out[..., :1] / 9.0

    scene = rng.normal(size=(250, 100, 2)).astype(np.float32)
    kwargs = dict(kernel=32, buffer=16, out_channels=1,
                  tile_mode="whole", whole_multiple=8)
    whole = TiledInferenceEngine(avg3, **kwargs)
    banded = TiledInferenceEngine(avg3, max_rows=96, **kwargs)
    a = np.asarray(whole.predict_scene(scene))
    b = np.asarray(banded.predict_scene(scene))
    # interior exact; global edges differ only where roll wraps vs pad
    np.testing.assert_allclose(a[1:-1, 1:-1], b[1:-1, 1:-1], rtol=1e-5, atol=1e-6)


def test_engine_hann_blend_identity(rng):
    scene = rng.normal(size=(320, 320, 1)).astype(np.float32)
    k, b = 64, 32
    engine = TiledInferenceEngine(
        lambda c: c, kernel=k, buffer=b, batch_size=4, out_channels=1, blend="hann"
    )
    got = np.asarray(engine.predict_scene(scene))
    half = b // 2
    np.testing.assert_allclose(
        got[half:-half, half:-half], scene[half:-half, half:-half], rtol=1e-3, atol=1e-4
    )


def test_engine_banded_streaming(rng):
    """Banded (bounded-memory) path equals the single-shot path."""
    scene = rng.normal(size=(512, 256, 2)).astype(np.float32)
    k, b = 64, 32
    kwargs = dict(kernel=k, buffer=b, batch_size=4, out_channels=1, blend="overwrite")
    whole = np.asarray(TiledInferenceEngine(_mean_model, **kwargs).predict_scene(scene))
    banded = np.asarray(
        TiledInferenceEngine(_mean_model, max_rows=300, **kwargs).predict_scene(scene)
    )
    half = b // 2
    np.testing.assert_allclose(
        banded[half:-half, half:-half], whole[half:-half, half:-half], rtol=1e-5
    )


def _context_model(chips):
    """Toy model with a real receptive field: 9x9 box filter via cumulative
    pooling — any chip-grid misalignment between banded and whole-scene
    passes changes its output, unlike a per-pixel model."""
    import jax.numpy as jnp
    from jax import lax

    x = chips.mean(axis=-1, keepdims=True)
    w = jnp.ones((9, 9, 1, 1), x.dtype) / 81.0
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@pytest.mark.parametrize("blend,mode", [
    ("overwrite", "grid"),
    ("overwrite", "reference"),
    ("hann", "grid"),
])
def test_engine_banded_matches_whole_with_receptive_field(rng, blend, mode):
    """Interior bands must keep the whole-scene chip grid: with a model
    whose receptive field exceeds buffer/2, a shifted grid (the round-1
    defect) produces different values across entire bands."""
    scene = rng.normal(size=(448, 192, 2)).astype(np.float32)
    k, b = 64, 32
    kwargs = dict(
        kernel=k, buffer=b, batch_size=4, out_channels=1, blend=blend, index_mode=mode
    )
    whole = np.asarray(
        TiledInferenceEngine(_context_model, **kwargs).predict_scene(scene)
    )
    banded = np.asarray(
        TiledInferenceEngine(_context_model, max_rows=300, **kwargs).predict_scene(scene)
    )
    np.testing.assert_allclose(banded, whole, rtol=1e-5, atol=1e-6)


def test_mixer_roundtrip(tmp_path):
    mixer = MixerInfo(
        total_patches=6,
        patches_per_row=3,
        patch_dimensions=(32, 32),
        affine=(10.0, 0.0, 1.0, 0.0, -10.0, 2.0),
        crs="EPSG:4326",
    )
    path = str(tmp_path / "mixer.json")
    write_mixer(path, mixer)
    back = read_mixer(path)
    assert back == mixer
    assert back.rows == 2
    assert back.scene_shape == (64, 96)


def test_reassemble_patches(rng):
    mixer = MixerInfo(6, 3, (16, 16), (1, 0, 0, 0, 1, 0), "EPSG:4326")
    buff = (8, 8)
    scene = rng.normal(size=(32, 48, 2)).astype(np.float32)
    # cut buffered patches row-major from a padded scene
    padded = np.pad(scene, ((4, 4), (4, 4), (0, 0)))
    patches = []
    for r in range(2):
        for c in range(3):
            patches.append(padded[r * 16 : r * 16 + 24, c * 16 : c * 16 + 24, :])
    got = reassemble_patches(np.stack(patches), mixer, buff)
    np.testing.assert_array_equal(got, scene)


def test_reassemble_count_mismatch(rng):
    mixer = MixerInfo(6, 3, (16, 16), (1, 0, 0, 0, 1, 0), "")
    with pytest.raises(ValueError):
        reassemble_patches(np.zeros((5, 16, 16, 1)), mixer, (0, 0))


def test_write_tfrecord_predictions(tmp_path, rng):
    preds = rng.uniform(size=(4, 24, 24, 2)).astype(np.float32)
    path = str(tmp_path / "preds.tfrecords")
    write_tfrecord_predictions(preds, path, kernel_shape=(16, 16), kernel_buffer=(8, 8))
    back = read_tfrecord_file(path, compression=None)
    assert len(back) == 4
    assert set(back[0]) == {"b1", "b2"}
    np.testing.assert_allclose(
        back[0]["b1"], preds[0, 4:20, 4:20, 0].reshape(-1), rtol=1e-6
    )


# ---------------------------------------------------------------- nodata cull
def _nodata_scene(rng, h=300, w=260, c=3, nodata=0.0):
    """Scene with an all-nodata top-left quadrant + nodata right margin —
    the swath-edge shape culling exists for."""
    scene = rng.normal(size=(h, w, c)).astype(np.float32) + 5.0
    scene[: h // 2, : w // 2] = nodata
    scene[:, -40:] = nodata
    return scene


@pytest.mark.parametrize("blend", ["overwrite", "hann"])
@pytest.mark.parametrize("mode", ["grid", "reference"])
def test_engine_nodata_cull_exact_on_valid(rng, blend, mode):
    """Culling chips whose full window is nodata must not change a single
    valid pixel, for either blend and either index mode: every chip whose
    window touches a valid pixel is kept, so valid pixels keep their full
    contribution set."""
    scene = _nodata_scene(rng)
    kw = dict(kernel=64, buffer=32, batch_size=4, out_channels=1,
              blend=blend, index_mode=mode)
    plain = TiledInferenceEngine(_mean_model, **kw)
    culled = TiledInferenceEngine(_mean_model, nodata=0.0, **kw)
    want = np.asarray(plain.predict_scene(scene))
    got = np.asarray(culled.predict_scene(scene))
    # a culled program really ran, and it ran fewer forwards
    cull_keys = [k for k in culled._compiled if k[0] == "cull"]
    assert len(cull_keys) == 1
    n_kept = int(culled.chip_validity(scene).sum())
    n_total = len(culled.chip_validity(scene))
    assert 0 < n_kept < n_total
    valid = (scene != 0.0).any(-1)
    np.testing.assert_allclose(got[valid], want[valid], rtol=1e-5, atol=1e-5)


def test_engine_nodata_cull_noop_and_all(rng):
    """A fully valid scene takes the ordinary cached program (no cull
    compile); an all-nodata scene returns zeros without any forward, in
    the output_transform's dtype."""
    import jax.numpy as jnp

    kw = dict(kernel=64, buffer=32, batch_size=4, out_channels=1, blend="hann")
    engine = TiledInferenceEngine(
        _mean_model, nodata=0.0,
        output_transform=lambda p: (p * 255.0).astype(jnp.uint8), **kw,
    )
    full = rng.normal(size=(128, 128, 2)).astype(np.float32) + 3.0
    got = np.asarray(engine.predict_scene(full))
    assert not any(k[0] == "cull" for k in engine._compiled)
    assert got.dtype == np.uint8

    empty = np.zeros((128, 128, 2), np.float32)
    got = np.asarray(engine.predict_scene(empty))
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, 0)


def test_engine_nodata_cull_nan(rng):
    """NaN nodata: invalid = every channel NaN (the PC/xarray convention,
    utils/pc_tools.py:90-107 feeds NaN-holed composites)."""
    scene = rng.normal(size=(200, 200, 2)).astype(np.float32)
    scene[:100] = np.nan
    kw = dict(kernel=64, buffer=0, batch_size=4, out_channels=1, blend="overwrite")
    plain = TiledInferenceEngine(_mean_model, **kw)
    culled = TiledInferenceEngine(_mean_model, nodata=float("nan"), **kw)
    want = np.asarray(plain.predict_scene(scene))
    got = np.asarray(culled.predict_scene(scene))
    valid = ~np.isnan(scene).all(-1)
    np.testing.assert_allclose(got[valid], want[valid], rtol=1e-5)
    # rows covered only by culled chips are zero, not NaN: their forwards
    # never ran (kept chips straddling the boundary still emit NaN at
    # nodata pixels, exactly like the uncull engine)
    np.testing.assert_array_equal(got[:64], 0.0)


def test_engine_nodata_cull_pipelined(rng):
    """predict_scenes computes validity in the staging thread (no D2H):
    pipelined culled results match the per-scene path scene-for-scene."""
    scenes = [_nodata_scene(rng, 192, 192, 2) for _ in range(3)]
    scenes.append(np.zeros((192, 192, 2), np.float32))  # all nodata
    engine = TiledInferenceEngine(
        _mean_model, kernel=64, buffer=32, batch_size=4, out_channels=1,
        blend="hann", nodata=0.0,
    )
    piped = [np.asarray(p) for p in engine.predict_scenes(iter(scenes), readback=True)]
    for scene, got in zip(scenes, piped):
        want = np.asarray(engine.predict_scene(scene))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("mode", ["grid", "reference"])
def test_engine_nodata_cull_banded(rng, mode):
    """Banded streaming culls per band (the swath-edge workload is the
    tall-scene one): banded culled == banded unculled on valid pixels,
    and an all-nodata band runs zero forwards."""
    scene = _nodata_scene(rng, 420, 200, 2)
    scene[:130] = 0.0  # top band fully nodata
    kw = dict(kernel=64, buffer=32, batch_size=4, out_channels=1,
              blend="hann", index_mode=mode, max_rows=160)
    plain = TiledInferenceEngine(_mean_model, **kw)
    culled = TiledInferenceEngine(_mean_model, nodata=0.0, **kw)
    want = np.asarray(plain.predict_scene(scene))
    got = np.asarray(culled.predict_scene(scene))
    assert any(k[0] == "cull" for k in culled._compiled)
    valid = (scene != 0.0).any(-1)
    np.testing.assert_allclose(got[valid], want[valid], rtol=1e-5, atol=1e-5)


def test_engine_banded_lazy_geotiff(tmp_path, rng):
    """A file-backed GeoTiffScene streams through the banded path without
    materializing (only O(band) rows decode per job) and combines with
    nodata culling: result equals the in-memory scene's bit-for-bit."""
    from satellite_computervision_tpu.geo import GeoTiffScene, write_geotiff

    scene = _nodata_scene(rng, 420, 200, 2)
    path = str(tmp_path / "swath.tif")
    write_geotiff(path, scene, nodata=0.0)
    lazy = GeoTiffScene(path)
    engine = TiledInferenceEngine(
        _mean_model, kernel=64, buffer=32, batch_size=4, out_channels=1,
        blend="hann", max_rows=160, nodata=0.0,
    )
    want = np.asarray(engine.predict_scene(scene))
    got = np.asarray(engine.predict_scene(lazy))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("mode", ["grid", "reference"])
def test_engine_stream_to_geotiff_matches_predict(tmp_path, rng, mode):
    """predict_scene_to_geotiff streams band outputs straight to a striped
    GeoTIFF: the file must read back equal to predict_scene, including the
    reference-mode zero margins, a uint8 output_transform's dtype, and
    nodata culling — the disk→disk swath pipeline end to end."""
    import jax.numpy as jnp
    from satellite_computervision_tpu.geo import GeoTiffScene, write_geotiff

    scene = _nodata_scene(rng, 420, 200, 2)
    in_path = str(tmp_path / "in.tif")
    write_geotiff(in_path, scene, nodata=0.0)
    engine = TiledInferenceEngine(
        _mean_model, kernel=64, buffer=32, batch_size=4, out_channels=1,
        blend="hann", index_mode=mode, max_rows=160, nodata=0.0,
        output_transform=lambda p: (p * 255.0).astype(jnp.uint8),
    )
    want = np.asarray(engine.predict_scene(scene))
    out_path = str(tmp_path / f"out_{mode}.tif")
    got_path = engine.predict_scene_to_geotiff(
        GeoTiffScene(in_path), out_path,
        transform=(10, 0, 5, 0, -10, 7), crs="EPSG:32617", nodata_tag=0)
    assert got_path == out_path
    sc = GeoTiffScene(out_path)
    assert sc.dtype == np.uint8 and sc.shape == (420, 200, 1)
    assert "32617" in sc.meta["crs"] and sc.nodata == 0.0
    np.testing.assert_array_equal(np.asarray(sc), want)


def test_engine_stream_to_geotiff_short_scene(tmp_path, rng):
    """Scenes that fit under max_rows (or with banding off) fall back to
    one predict_scene pass then a single streamed write."""
    from satellite_computervision_tpu.geo import read_geotiff

    scene = rng.normal(size=(96, 80, 2)).astype(np.float32)
    engine = TiledInferenceEngine(
        _mean_model, kernel=32, buffer=16, batch_size=4, out_channels=1,
        blend="hann",
    )
    want = np.asarray(engine.predict_scene(scene))
    path = str(tmp_path / "short.tif")
    engine.predict_scene_to_geotiff(scene, path)
    back, _ = read_geotiff(path)
    np.testing.assert_array_equal(back, want)


def test_engine_stream_to_geotiff_coerces_dtype(tmp_path, rng):
    """Output dtypes TIFF can't hold (e.g. a float16 transform) coerce to
    float32 on the streamed path, matching write_geotiff — the same
    command must not fail depending only on scene height."""
    import jax.numpy as jnp
    from satellite_computervision_tpu.geo import read_geotiff

    scene = rng.normal(size=(420, 200, 2)).astype(np.float32)
    engine = TiledInferenceEngine(
        _mean_model, kernel=64, buffer=32, batch_size=4, out_channels=1,
        blend="hann", max_rows=160,
        output_transform=lambda p: p.astype(jnp.float16),
    )
    path = str(tmp_path / "f16.tif")
    engine.predict_scene_to_geotiff(scene, path)
    back, _ = read_geotiff(path)
    assert back.dtype == np.float32
    want = np.asarray(engine.predict_scene(scene)).astype(np.float32)
    np.testing.assert_allclose(back, want, rtol=1e-3, atol=1e-3)


def test_engine_stream_to_cog(tmp_path, rng):
    """cog=True streams tiled output + overview pyramid at the same band
    memory bound; base page equals the plain streamed output."""
    from satellite_computervision_tpu.geo import read_geotiff

    scene = rng.normal(size=(420, 200, 2)).astype(np.float32)
    engine = TiledInferenceEngine(
        _mean_model, kernel=64, buffer=32, batch_size=4, out_channels=1,
        blend="hann", max_rows=160,
    )
    want = np.asarray(engine.predict_scene(scene))
    path = str(tmp_path / "pred_cog.tif")
    engine.predict_scene_to_geotiff(scene, path, transform=(10, 0, 0, 0, -10, 0),
                                    crs="EPSG:32617", cog=True)
    base, meta = read_geotiff(path, page=0)
    np.testing.assert_array_equal(base, want)
    over, over_meta = read_geotiff(path, page=1)
    assert over.shape == (210, 100, 1)
    assert over_meta["transform"][0] == 20.0
