"""Reference-API compatibility layer.

Maps the public names of mjevans26/Satellite_ComputerVision's ``utils``
modules onto this framework, so reference users can locate every
capability one-for-one. Signatures follow the reference where the
underlying design allows; TPU-native replacements (engine objects, jitted
functions) are returned where the reference returned Keras models or ran
eager loops. Each entry cites the reference symbol it stands in for.

This is a convenience veneer — new code should import the real modules.
"""

from __future__ import annotations

import jax.numpy as jnp

# --- utils/processing.py ---------------------------------------------------
from satellite_computervision_tpu.data.matching import (  # noqa: F401
    get_file_id,      # processing.py:26
    match_files,      # processing.py:47
    split_files,      # processing.py:91
)
from satellite_computervision_tpu.ops.bands import calc_ndvi  # processing.py:116
from satellite_computervision_tpu.ops.augment import (  # noqa: F401
    aug_color as aug_tensor_color,   # processing.py:129
    aug_morph as aug_tensor_morph,   # processing.py:169
    aug_morph as aug_array_morph,    # array_tools.py:186
    aug_color_hsv as augColor,       # processing.py:154
)
from satellite_computervision_tpu.ops.normalize import (  # noqa: F401
    normalize_image as normalize_tensor,   # processing.py:225
    rescale_image as rescale_tensor,       # processing.py:281
    normalize_timeseries,                  # array_tools.py:215
)

# The reference's NumPy twins are NaN-aware (np.nanmean/np.nanstd/np.nanmin),
# normalize divides by std + eps and takes (mean, std) moment tuples, and
# aug_array_color draws scalar (not per-channel) multipliers
# (utils/array_tools.py:47-184) — bind those flavors explicitly.
import functools as _functools

from satellite_computervision_tpu.ops import augment as _augment
from satellite_computervision_tpu.ops import normalize as _normalize

normalize_array = _functools.partial(          # array_tools.py:47
    _normalize.normalize_image, nan_aware=True, std_form=True
)
rescale_array = _functools.partial(            # array_tools.py:109
    _normalize.rescale_image, nan_aware=True
)
aug_array_color = _functools.partial(          # array_tools.py:159
    _augment.aug_color, per_channel=False, nan_aware=True
)
from satellite_computervision_tpu.data.pipeline import (  # noqa: F401
    make_preprocess_fn as to_tuple,        # processing.py:335 (jitted batch form)
    get_training_dataset,                  # processing.py:421
    get_eval_dataset,                      # processing.py:443
)


def get_dataset(files, feature_names, kernel_size=256, compression="GZIP",
                workers=2):
    """processing.py:394 — the parsed (unshuffled, unbatched) chip stream;
    shuffle/batch/repeat live on get_training_dataset, as in the
    reference."""
    from satellite_computervision_tpu.data.pipeline import ChipDataset

    return ChipDataset(files, feature_names, kernel_size, compression,
                       workers=workers)
from satellite_computervision_tpu.data.chip_generators import (  # noqa: F401
    UNetChipDataset as UNETDataGenerator,              # processing.py:456
    SiameseChipDataset as SiameseDataGenerator,        # processing.py:757
    LSTMChipDataset as LSTMDataGenerator,              # processing.py:895
    LSTMAutoencoderChipDataset as LSTMAutoencoderGenerator,  # processing.py:974
    HybridChipDataset as HybridDataGenerator,          # processing.py:1051
    rearrange_timeseries,                              # processing.py:195
    split_timeseries,                                  # processing.py:209
)

# --- utils/array_tools.py --------------------------------------------------
from satellite_computervision_tpu.ops.harmonics import (  # noqa: F401
    make_harmonics,   # array_tools.py:12
    sin_cos,          # array_tools.py:283
    add_harmonic,     # array_tools.py:288
)
from satellite_computervision_tpu.ops.classes import merge_classes  # array_tools.py:26

# --- utils/model_tools.py --------------------------------------------------
from satellite_computervision_tpu.models.losses import (  # noqa: F401
    weighted_categorical_crossentropy,  # model_tools.py:25
    gen_dice,                           # model_tools.py:42
    weighted_bce,                       # model_tools.py:96
    iou_loss,                           # model_tools.py:131
    mse_4d,                             # model_tools.py:142
)
from satellite_computervision_tpu.models.metrics import (  # noqa: F401
    normalize_confusion_matrix,  # model_tools.py:1111
)
from satellite_computervision_tpu.models.blocks import (  # noqa: F401
    ConvBNAct as conv_batch_act,  # model_tools.py:174
    ConvBlock as conv_block,      # model_tools.py:211
    EncoderBlock as encoder_block,  # model_tools.py:262
    DecoderBlock as decoder_block,  # model_tools.py:288
    ASPP as DilatedSpatialPyramidPooling,  # model_tools.py:533
)


# The reference's functional-style layer builders return Keras tensors
# wired into a graph (model_tools.py:321,576,666,719,922,941); in flax the
# layer stack IS a Module, so each builder returns the corresponding
# module — apply it (or compose it inside a parent Module) instead of
# threading tensors through it.


def build_unet_layers(filters=(32, 64, 128, 256, 512), factors=(2, 2, 2, 2, 2),
                      dropout=None, **kwargs):
    """model_tools.py:321 — the U-Net trunk as a Module (linear head; add
    your own head conv as the reference's get_*_model wrappers do)."""
    from satellite_computervision_tpu.models import UNet

    return UNet(n_classes=1, head="linear", filters=tuple(filters),
                factors=tuple(factors), dropout=dropout, **kwargs)


def get_siamese_layers(filters=(32, 64, 128), factors=(2, 2, 2), **kwargs):
    """model_tools.py:576 — the shared-encoder siamese trunk as a Module
    (make_siamese_unet adds the sigmoid head; here threshold/bias are
    left at defaults)."""
    from satellite_computervision_tpu.models import SiameseUNet

    return SiameseUNet(filters=tuple(filters), factors=tuple(factors), **kwargs)


def build_lstm_layers(**kwargs):
    """model_tools.py:666 — 2x ConvLSTM2D stack as a Module."""
    from satellite_computervision_tpu.models.convlstm import LSTMStack

    return LSTMStack(**kwargs)


def build_lstm_layers2(**kwargs):
    """model_tools.py:719 — state-returning residual ConvLSTM variant."""
    from satellite_computervision_tpu.models.convlstm import LSTMStack2

    return LSTMStack2(**kwargs)


def build_acnn_layers(nfilters=16, depth=16, **kwargs):
    """model_tools.py:922 — atrous-CNN residual trunk as a Module
    (variant-1 wiring: plain conv consumes the raw pre-BN conv output)."""
    from satellite_computervision_tpu.models.acnn import ACNNTrunk

    kwargs.setdefault("variant", 1)
    return ACNNTrunk(features=nfilters, n_blocks=depth, **kwargs)


def build_acnn_layers2(nfilters=16, depth=16, **kwargs):
    """model_tools.py:941 — variant-2 wiring (plain conv consumes the
    activated output)."""
    from satellite_computervision_tpu.models.acnn import ACNNTrunk

    kwargs.setdefault("variant", 2)
    return ACNNTrunk(features=nfilters, n_blocks=depth, **kwargs)


def get_unet_model(nclasses, nchannels=None, filters=(32, 64, 128, 256, 512),
                   factors=(2, 2, 2, 2, 2), bias=None, dropout=None, **kwargs):
    """model_tools.py:394 — multiclass softmax U-Net (flax module; channel
    count comes from the input array at init time)."""
    from satellite_computervision_tpu.models import UNet

    return UNet(n_classes=nclasses, filters=tuple(filters), factors=tuple(factors),
                head="softmax", output_bias=bias, dropout=dropout, **kwargs)


def binary_unet(bias=None, threshold=0.5, **kwargs):
    """model_tools.py:417 — fixed 5-level binary U-Net."""
    from satellite_computervision_tpu.models import UNet

    return UNet(n_classes=1, head="sigmoid", threshold=threshold,
                output_bias=bias, **kwargs)


get_binary_model = binary_unet  # model_tools.py:456


def get_autoencoder(nclasses=1, **kwargs):
    """model_tools.py:496 — linear-head U-Net."""
    from satellite_computervision_tpu.models import UNet

    return UNet(n_classes=nclasses, head="linear", **kwargs)


def make_siamese_unet(n_channels=None, filters=(32, 64, 128), factors=(2, 2, 2),
                      bias=None, class_thresh=0.5, **kwargs):
    """model_tools.py:638."""
    from satellite_computervision_tpu.models import SiameseUNet

    return SiameseUNet(filters=tuple(filters), factors=tuple(factors),
                       threshold=class_thresh, output_bias=bias, **kwargs)


def get_lstm_model(n_channels=None, n_classes=1, n_time=None, dropout=None, **kwargs):
    """model_tools.py:773."""
    from satellite_computervision_tpu.models import LSTMModel

    return LSTMModel(n_classes=n_classes, dropout=dropout, **kwargs)


def get_lstm_autoencoder(n_channels=None, n_time=6, n_classes=1, **kwargs):
    """model_tools.py:810."""
    from satellite_computervision_tpu.models import LSTMAutoencoder

    return LSTMAutoencoder(n_classes=n_classes, n_time=n_time, **kwargs)


def get_hybrid_model(unet_dim=None, lstm_dim=None, n_classes=8,
                     filters=(32, 64, 128, 256), factors=(3, 2, 2, 2),
                     dropout=None, **kwargs):
    """model_tools.py:874."""
    from satellite_computervision_tpu.models import HybridUNetLSTM

    return HybridUNetLSTM(n_classes=n_classes, filters=tuple(filters),
                          factors=tuple(factors), dropout=dropout, **kwargs)


def get_acnn_model(nclasses, nfilters=16, nchannels=None, depth=16, **kwargs):
    """model_tools.py:981 (variant-1 wiring)."""
    from satellite_computervision_tpu.models import ACNN

    return ACNN(n_classes=nclasses, n_blocks=depth, features=nfilters, **kwargs)


def get_acnn_model2(nclasses, nchannels=None, nfilters=16, depth=16, **kwargs):
    """model_tools.py:992 (variant-2 wiring)."""
    from satellite_computervision_tpu.models import ACNN

    return ACNN(n_classes=nclasses, n_blocks=depth, features=nfilters, **kwargs)


def get_hierarchical_model(nclasses, acnn_nclasses, acnn_sub_nclasses,
                           acnn_dim=None, lstm_dim=None, nfilters=16, depth=16, **kwargs):
    """model_tools.py:1016."""
    from satellite_computervision_tpu.models import HierarchicalACNN

    return HierarchicalACNN(
        n_classes=nclasses, acnn_classes=acnn_nclasses, sub_classes=acnn_sub_nclasses,
        n_blocks=depth, features=nfilters, **kwargs,
    )


def retrain_model(*args, **kwargs):
    """model_tools.py:1128 — see train.retrain.retrain."""
    from satellite_computervision_tpu.train.retrain import retrain

    return retrain(*args, **kwargs)


def get_blob_weights(url, target):
    """model_tools.py:1178 — https weights into a param pytree."""
    from satellite_computervision_tpu.train.checkpoint import load_remote_weights

    return load_remote_weights(url, target)


def get_blob_model(model_url=None, weights_url=None, target=None,
                   batch_stats=None, family: str = "unet"):
    """model_tools.py:1204 — remote model restore.

    The reference streams Keras ``.h5``/``.hdf5`` blobs from Azure over
    https; URLs ending in those suffixes are fetched and mapped through
    train.keras_import (``target``/``batch_stats`` = the flax trees of a
    ``UNet(convs_per_block=1)`` / ``SiameseUNet(convs_per_block=1)``,
    ``family`` picks the mapper). Anything else restores this framework's
    msgpack checkpoints."""
    import urllib.request

    url = weights_url or model_url
    base = url.split("?")[0].lower()
    if base.endswith((".h5", ".hdf5")):
        from satellite_computervision_tpu.train import keras_import

        with urllib.request.urlopen(url) as resp:
            blob = resp.read()
        loaders = {
            "siamese": keras_import.load_keras_siamese_h5,
            "lstm": keras_import.load_keras_lstm_h5,
            "convlstm": keras_import.load_keras_lstm_h5,
            "lstm_autoencoder": keras_import.load_keras_lstm_autoencoder_h5,
            "hybrid": keras_import.load_keras_hybrid_h5,
        }
        loader = loaders.get(family, keras_import.load_keras_unet_h5)
        return loader(blob, target, batch_stats)
    from satellite_computervision_tpu.train.checkpoint import load_remote_weights

    return load_remote_weights(url, target)


def predict_chunk(data, m=None, model=None, output_key: str = "probs",
                  model_blob_url=None, weights_blob_url=None,
                  target=None, batch_stats=None, family: str = "unet"):
    """model_tools.py:1271 — the Dask-worker chunk predictor: (C, H, W)
    chunk -> CHW→NHWC -> predict -> squeezed logits.

    ``m`` is a chip-batch predict fn with weights already on device — the
    TPU rebuild's fix for the reference's pathological per-chunk model
    re-download (each Dask worker fetched the blob model per chunk). The
    blob-URL drop-in form takes a flax ``model`` (+ ``target`` param tree
    for the weight mapping) and restores through get_blob_model once;
    parallel.sharded_inference is the real mesh-sharded replacement for
    the whole map_overlap pattern."""
    import numpy as np

    if m is None:
        if model is None or target is None or not (model_blob_url or weights_blob_url):
            raise ValueError(
                "pass a predict fn `m`, or model+target+blob URL(s)")
        variables = get_blob_model(model_blob_url, weights_blob_url,
                                   target=target, batch_stats=batch_stats,
                                   family=family)
        if isinstance(variables, tuple):  # keras_import: (params, batch_stats)
            variables = {"params": variables[0], "batch_stats": variables[1]}
        elif not isinstance(variables, dict) or "params" not in variables:
            variables = {"params": variables}
        m = lambda chips: model.apply(variables, chips)[output_key]
    hwc = jnp.moveaxis(jnp.asarray(data), 0, -1)
    pred = m(hwc[None])[0]
    return np.squeeze(np.asarray(pred))


# --- utils/prediction_tools.py --------------------------------------------
from satellite_computervision_tpu.ops.chips import (  # noqa: F401
    generate_chip_indices,  # prediction_tools.py:87 / raster_tools.py:23
    extract_chips,          # prediction_tools.py:111 / raster_tools.py:48
)


import collections as _collections

# Bounded LRU of engines: an unbounded dict keyed on the predict-fn object
# would retain every engine (and its compiled programs) forever, and a
# caller passing a fresh lambda per call would grow it without limit.
_PREDICT_ENGINES: "_collections.OrderedDict" = _collections.OrderedDict()
_PREDICT_ENGINES_MAX = 8


def predict_chips(arr, chip_indices, template, m, kernel=256, buff=128,
                  cache_key=None):
    """prediction_tools.py:133 — use TiledInferenceEngine: the whole loop
    runs as one compiled program. ``m`` is a chip-batch predict fn.

    Engines are cached per (predict fn, geometry) in a small LRU: on this
    toolchain a fresh engine means a minutes-long recompile per call, so
    repeated calls with the same model and chip geometry must reuse one
    engine (and its compiled per-shape programs). Callers that build a
    fresh lambda per call should pass a stable ``cache_key`` (any hashable
    identifying the model) so the lambda's identity doesn't defeat the
    cache."""
    from satellite_computervision_tpu.inference import TiledInferenceEngine

    out_channels = template.shape[-1] if template.ndim == 3 else 1
    key = (cache_key if cache_key is not None else m, kernel, buff, out_channels)
    engine = _PREDICT_ENGINES.get(key)
    if engine is None:
        engine = TiledInferenceEngine(
            m, kernel=kernel, buffer=buff, batch_size=16,
            out_channels=out_channels,
            blend="sum", index_mode="reference",
        )
        _PREDICT_ENGINES[key] = engine
        while len(_PREDICT_ENGINES) > _PREDICT_ENGINES_MAX:
            _PREDICT_ENGINES.popitem(last=False)
    else:
        _PREDICT_ENGINES.move_to_end(key)
    return engine.predict_scene(arr)


from satellite_computervision_tpu.inference.batch import (  # noqa: F401
    make_pred_batches as make_pred_dataset,   # prediction_tools.py:159
    run_batch_prediction as doPrediction,     # prediction_tools.py:602
    get_img_bounds,                           # prediction_tools.py:560
)
from satellite_computervision_tpu.inference.mixer import (  # noqa: F401
    reassemble_patches as make_array_predictions,  # prediction_tools.py:293
    read_mixer,
)
from satellite_computervision_tpu.inference.writers import (  # noqa: F401
    write_tfrecord_predictions,   # prediction_tools.py:375
    write_geotiff_predictions,    # prediction_tools.py:475 (streaming form)
    write_geotiff_predictions as write_geotiff_prediction,  # prediction_tools.py:447
)
from satellite_computervision_tpu.inference.mixer import (  # noqa: F401
    reassemble_patches as callback_predictions,  # prediction_tools.py:245
)
from satellite_computervision_tpu.utils.viz import plot_to_image  # prediction_tools.py:228

# --- utils/raster_tools.py -------------------------------------------------
from satellite_computervision_tpu.geo.transforms import (  # noqa: F401
    convert_yolo_bbox as convert,   # raster_tools.py:70
    make_window,                    # raster_tools.py:98
    geo_transform_from_mixer as get_geo_transform,  # raster_tools.py:120
    convert_poly_coords,            # raster_tools.py:144
    convert_pt,                     # raster_tools.py:216
    win_jitter,                     # raster_tools.py:235
    polygon_centroid as get_centroid,  # raster_tools.py:251
    make_jittered_window,           # raster_tools.py:287
)
from satellite_computervision_tpu.utils.viz import save_rgb_image as rasterio_to_img  # raster_tools.py:333
from satellite_computervision_tpu.geo.assembly import (  # noqa: F401
    numpy_to_raster,  # raster_tools.py:367
    arrays_to_cog,    # raster_tools.py:411
)

# --- utils/ee_tools.py (on-device math; server-side client in cloud.ee) ----
from satellite_computervision_tpu.cloud.masking import (  # noqa: F401
    norm_p,                # ee_tools.py:9
    chi_p,                 # ee_tools.py:21
    gamma_p,               # ee_tools.py:31
    normalize_minmax as normalize,  # ee_tools.py:39
    standardize,           # ee_tools.py:52
    lda_score as ldaScore,  # ee_tools.py:73
    sentinel2toa,          # ee_tools.py:90
    rescale,               # ee_tools.py:110
    water_score as waterScore,   # ee_tools.py:115
    basic_qa_mask as basicQA,    # ee_tools.py:159
    landsat8_sr_mask as maskL8sr,  # ee_tools.py:183
    cloud_bands as cloudBands,   # ee_tools.py:198
    dark_channels as darkC,      # ee_tools.py:206
    sentinel_cloud_score as sentinelCloudScore,  # ee_tools.py:218
    scl_mask as maskSR,          # ee_tools.py:270
    toa_mask as maskTOA,         # ee_tools.py:289
    combined_mask as mask,       # ee_tools.py:257 (CDI/JRC planes optional)
)

# --- utils/calibration.py --------------------------------------------------
from satellite_computervision_tpu.cloud.calibration import (  # noqa: F401
    clamp_and_scale,       # calibration.py:12
    scene_median,          # calibration.py:47
    overlap_mask as get_overlap,  # calibration.py:64
    histogram_cdf as hist_to_FC,  # calibration.py:78
    make_FC,               # calibration.py:105 (per-band (bucket_means, cdf) list)
    equalize_scene as equalize,   # calibration.py:136 (exact CDF-interp form)
    equalize_rf,           # calibration.py:136 (the shipped chained-RF form)
    equalize_collection,   # calibration.py:184
)

# --- utils/pc_tools.py -----------------------------------------------------
from satellite_computervision_tpu.cloud.pc import (  # noqa: F401
    retry as recursive_api_try,   # pc_tools.py:44 (bounded, unlike the ref)
    resign_vrt,                   # pc_tools.py:55 (pure-XML, no GDAL)
    harmonize_to_old,             # pc_tools.py:284
    normalize_xarray as normalize_dataArray,  # pc_tools.py:90
    trim_to_chunk_multiple as trim_dataArray,  # pc_tools.py:109
    get_naip_stac,                # pc_tools.py:131
    get_dem_stac,                 # pc_tools.py:188
    get_hag_stac,                 # pc_tools.py:224
    get_s2_stac,                  # pc_tools.py:328
    get_s1_stac,                  # pc_tools.py:388
    get_ssurgo_stac,              # pc_tools.py:496
    join_ssurgo,                  # pc_tools.py:544
    predict_scene as run_local,   # pc_tools.py:620
    predict_scene as run_dask,    # pc_tools.py:670 (mesh replaces Dask)
    predict_scene as predict_pc_local,  # prediction_tools.py:731 (= run_local)
    predict_scene as predict_pc_dask,   # prediction_tools.py:781 (= run_dask)
)
from satellite_computervision_tpu.cloud.blob import save_numpy as export_blob  # pc_tools.py:83
from satellite_computervision_tpu.cloud.compositing import (  # noqa: F401
    mosaic_tiles as naip_mosaic,          # pc_tools.py:264 (array-level)
    composite_items as get_pc_imagery,    # pc_tools.py:564 (median composite core)
    stack_items,
    median_composite,
    change_pair_composite,
)

# --- utils/stats.py --------------------------------------------------------
from satellite_computervision_tpu.ops.stats import (  # noqa: F401
    gamma_pdf,      # stats.py:4
    lognormal_pdf,  # stats.py:25
)
