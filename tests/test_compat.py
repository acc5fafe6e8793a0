"""The compat veneer exposes every reference public symbol."""

import numpy as np
import pytest


def test_every_reference_symbol_resolves():
    from satellite_computervision_tpu import compat

    # SURVEY.md §2 public interface inventory, by reference module
    symbols = [
        # processing.py
        "get_file_id", "match_files", "split_files", "calc_ndvi",
        "aug_tensor_color", "augColor", "aug_tensor_morph",
        "normalize_tensor", "rescale_tensor", "to_tuple", "get_dataset",
        "get_training_dataset",
        "get_eval_dataset", "UNETDataGenerator", "SiameseDataGenerator",
        "LSTMDataGenerator", "LSTMAutoencoderGenerator", "HybridDataGenerator",
        "rearrange_timeseries", "split_timeseries", "normalize_timeseries",
        # array_tools.py
        "make_harmonics", "merge_classes", "normalize_array", "rescale_array",
        "aug_array_color", "aug_array_morph", "sin_cos", "add_harmonic",
        # model_tools.py
        "weighted_categorical_crossentropy", "gen_dice", "weighted_bce",
        "iou_loss", "mse_4d", "conv_batch_act", "conv_block", "encoder_block",
        "decoder_block", "DilatedSpatialPyramidPooling", "build_unet_layers",
        "get_unet_model",
        "binary_unet", "get_binary_model", "get_autoencoder",
        "get_siamese_layers", "make_siamese_unet", "build_lstm_layers",
        "build_lstm_layers2", "get_lstm_model", "get_lstm_autoencoder",
        "get_hybrid_model", "build_acnn_layers", "build_acnn_layers2",
        "get_acnn_model", "get_acnn_model2",
        "get_hierarchical_model", "normalize_confusion_matrix",
        "retrain_model", "get_blob_weights", "get_blob_model", "predict_chunk",
        # prediction_tools.py
        "generate_chip_indices", "extract_chips", "predict_chips",
        "make_pred_dataset", "callback_predictions", "make_array_predictions",
        "write_tfrecord_predictions", "write_geotiff_prediction",
        "write_geotiff_predictions",
        "doPrediction", "get_img_bounds", "plot_to_image", "read_mixer",
        "predict_pc_local", "predict_pc_dask",
        # raster_tools.py
        "convert", "make_window", "win_jitter", "get_centroid",
        "make_jittered_window", "get_geo_transform", "convert_poly_coords",
        "convert_pt", "rasterio_to_img", "numpy_to_raster", "arrays_to_cog",
        # ee_tools.py
        "norm_p", "chi_p", "gamma_p", "normalize", "standardize", "ldaScore",
        "sentinel2toa", "rescale", "waterScore", "basicQA", "maskL8sr",
        "cloudBands", "darkC", "sentinelCloudScore", "mask", "maskSR",
        "maskTOA",
        # calibration.py
        "clamp_and_scale", "scene_median", "get_overlap", "hist_to_FC",
        "make_FC", "equalize", "equalize_collection",
        # pc_tools.py
        "recursive_api_try", "resign_vrt", "export_blob",
        "normalize_dataArray",
        "trim_dataArray", "get_naip_stac", "get_dem_stac", "get_hag_stac",
        "naip_mosaic", "get_s2_stac", "get_s1_stac", "get_ssurgo_stac",
        "join_ssurgo", "get_pc_imagery",
        "harmonize_to_old", "run_local", "run_dask",
        # stats.py
        "gamma_pdf", "lognormal_pdf",
    ]
    missing = [s for s in symbols if not hasattr(compat, s)]
    assert not missing, f"missing compat symbols: {missing}"


def test_compat_model_builders_construct():
    from satellite_computervision_tpu import compat

    import jax
    import jax.numpy as jnp

    m = compat.binary_unet(bias=-1.0, filters=(4,), factors=(2,))
    v = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    out = m.apply(v, jnp.zeros((1, 8, 8, 3)))
    assert out["probs"].shape == (1, 8, 8, 1)

    s = compat.make_siamese_unet(filters=(4,), factors=(2,), class_thresh=0.7)
    assert s.threshold == 0.7


def test_compat_predict_chips(rng):
    from satellite_computervision_tpu import compat

    scene = rng.normal(size=(320, 320, 2)).astype(np.float32)
    template = np.zeros((320, 320, 1), np.float32)
    out = np.asarray(
        compat.predict_chips(
            scene, None, template, lambda c: c.mean(-1, keepdims=True),
            kernel=64, buff=32,
        )
    )
    assert out.shape == (320, 320, 1)
    assert np.any(out != 0)

    # repeated calls with the same (model, geometry) must reuse one cached
    # engine (a fresh engine per call is a minutes-long recompile on the
    # real toolchain)
    m = lambda c: c.mean(-1, keepdims=True)  # noqa: E731
    compat._PREDICT_ENGINES.clear()
    compat.predict_chips(scene, None, template, m, kernel=64, buff=32)
    eng1 = compat._PREDICT_ENGINES[(m, 64, 32, 1)]
    compat.predict_chips(scene, None, template, m, kernel=64, buff=32)
    assert compat._PREDICT_ENGINES[(m, 64, 32, 1)] is eng1
    assert len(compat._PREDICT_ENGINES) == 1


def test_compat_numpy_twins_are_nan_aware(rng):
    """normalize_array/rescale_array/aug_array_color must bind the NumPy
    reference flavor: NaN-ignoring moments, std+eps denominator, (mean, std)
    moment tuples, scalar color multipliers (utils/array_tools.py:47-184)."""
    from satellite_computervision_tpu import compat

    x = rng.normal(size=(8, 8, 3)).astype(np.float32) * 5 + 2
    x[0, 0, 0] = np.nan

    got = np.asarray(compat.normalize_array(x, axes=(0, 1)))
    mean = np.nanmean(x, axis=(0, 1), keepdims=True)
    std = np.nanstd(x, axis=(0, 1), keepdims=True)
    want = (x - mean) / (std + 1e-8)
    np.testing.assert_allclose(got[~np.isnan(want)], want[~np.isnan(want)], rtol=1e-4, atol=1e-5)

    # explicit moments are (mean, std), not (mean, variance)
    got_m = np.asarray(
        compat.normalize_array(x, axes=(0, 1), moments=[(2.0, 4.0)] * 3)
    )
    want_m = (x - 2.0) / (4.0 + 1e-8)
    np.testing.assert_allclose(
        got_m[~np.isnan(want_m)], want_m[~np.isnan(want_m)], rtol=1e-4, atol=1e-5
    )

    got_r = np.asarray(compat.rescale_array(x, axes=(0, 1)))
    lo = np.nanmin(x, axis=(0, 1), keepdims=True)
    hi = np.nanmax(x, axis=(0, 1), keepdims=True)
    want_r = (x - lo) / ((hi - lo) + 1e-8)
    np.testing.assert_allclose(
        got_r[~np.isnan(want_r)], want_r[~np.isnan(want_r)], rtol=1e-4, atol=1e-5
    )

    # scalar multipliers: all channels share the same recolor transform, and
    # NaN pixels do not poison the channel means
    import jax

    out = np.asarray(compat.aug_array_color(jax.random.key(3), x))
    assert np.isfinite(out[1:]).all()


def test_compat_combined_mask(rng):
    """`mask` (ee_tools.py:257-268): keep = cloud-free AND water-free AND
    bright-B11; CDI ORs into the cloud test, JRC ANDs into the water
    test."""
    import jax.numpy as jnp

    from satellite_computervision_tpu import compat

    shape = (8, 8)
    bands = {
        b: jnp.asarray(rng.uniform(200, 2500, shape).astype(np.float32))
        for b in ("B1", "B2", "B3", "B4", "B8", "B10", "B11", "B12")
    }
    keep = np.asarray(compat.mask(bands))
    assert keep.shape == shape and keep.dtype == np.bool_
    # a dark-B11 pixel always drops (shadow test)
    dark = {k: v.at[0, 0].set(100.0) if k == "B11" else v
            for k, v in bands.items()}
    assert not np.asarray(compat.mask(dark))[0, 0]
    # CDI >= -0.2 overrides the cloud score entirely
    cdi = jnp.zeros(shape)
    keep_cdi = np.asarray(compat.mask(bands, cdi=cdi))
    assert (keep_cdi | ~keep).all()  # CDI can only add pixels to the keep set
    # JRC == 2 (permanent water) removes pixels
    jrc = jnp.full(shape, 2)
    assert not np.asarray(compat.mask(bands, jrc_water=jrc)).any()


def test_compat_predict_chunk(rng):
    """predict_chunk (model_tools.py:1271): CHW in, squeezed HW out."""
    from satellite_computervision_tpu import compat

    chunk = rng.normal(size=(3, 16, 16)).astype(np.float32)  # (C, H, W)
    out = compat.predict_chunk(chunk, m=lambda x: x.mean(-1, keepdims=True))
    np.testing.assert_allclose(out, chunk.mean(0), rtol=1e-5)
    with pytest.raises(ValueError, match="predict fn"):
        compat.predict_chunk(chunk)


def test_compat_layer_builders_are_modules(rng):
    """The functional-style Keras builders map to flax Modules that apply
    cleanly at reference shapes."""
    import jax
    import jax.numpy as jnp

    from satellite_computervision_tpu import compat

    trunk = compat.build_unet_layers(filters=(4, 8), factors=(2, 2))
    v = trunk.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
    assert trunk.apply(v, jnp.zeros((1, 16, 16, 3)))["continuous"].shape[:3] == (1, 16, 16)

    acnn1 = compat.build_acnn_layers(nfilters=4, depth=2)
    acnn2 = compat.build_acnn_layers2(nfilters=4, depth=2)
    assert acnn1.variant == 1 and acnn2.variant == 2
    v = acnn1.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))
    feats = acnn1.apply(v, jnp.zeros((1, 8, 8, 3)))
    assert feats[-1].shape == (1, 8, 8, 4)

    lstm = compat.build_lstm_layers(features=4)
    v = lstm.init(jax.random.key(0), jnp.zeros((1, 3, 8, 8, 2)))
    assert lstm.apply(v, jnp.zeros((1, 3, 8, 8, 2))).shape == (1, 8, 8, 4)

    assert compat.get_siamese_layers(filters=(4,), factors=(2,)).filters == (4,)
    assert compat.build_lstm_layers2(features=4).features == 4
