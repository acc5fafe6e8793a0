"""flax -> Keras .h5 weight export (train/keras_export.py).

Pure-numpy tests pin the exporter against the importer (bitwise roundtrip,
architecture inference); the opt-in TF test (SCV_TF_PARITY=1) builds the
reference's binary U-Net in tf.keras (utils/model_tools.py:417-454,
double-call bug included), `load_weights` the exported file into it, and
requires identical forward outputs — the hand-back direction of the
weight bridge.
"""

import io
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

h5py = pytest.importorskip("h5py")

from satellite_computervision_tpu.models import UNet
from satellite_computervision_tpu.train.keras_export import (
    export_keras_unet_h5,
    export_keras_unet_h5_bytes,
)
from satellite_computervision_tpu.train.keras_import import (
    infer_unet_arch,
    load_keras_unet_h5,
)

RUN_TF = os.environ.get("SCV_TF_PARITY") == "1"


def _random_variables(model, *inputs, seed=3):
    """Init then randomize every leaf (init BN stats are the constant
    mean=0/var=1, which would make a roundtrip test vacuous)."""
    variables = model.init(jax.random.key(0), *inputs)
    g = np.random.default_rng(seed)

    def rand(leaf):
        a = np.asarray(leaf, np.float32)
        return (g.normal(size=a.shape) * 0.2 + 0.75).astype(np.float32)

    params = jax.tree_util.tree_map(rand, variables["params"])
    stats = jax.tree_util.tree_map(rand, variables["batch_stats"])
    # variances must stay positive for the forward check
    stats = jax.tree_util.tree_map(lambda a: np.abs(a) + 0.25, stats)
    return params, stats


def _assert_trees_equal(a, b):
    fa, ta = jax.tree_util.tree_flatten_with_path(a)
    fb, tb = jax.tree_util.tree_flatten_with_path(b)
    assert ta == tb
    for (pa, la), (_, lb) in zip(fa, fb):
        np.testing.assert_array_equal(
            np.asarray(la), np.asarray(lb), err_msg=jax.tree_util.keystr(pa)
        )


@pytest.mark.parametrize("convs_per_block", [1, 2])
def test_export_import_roundtrip_bitwise(tmp_path, convs_per_block):
    model = UNet(
        n_classes=1, filters=(4, 8), factors=(2, 2), head="sigmoid",
        convs_per_block=convs_per_block,
    )
    x = jnp.zeros((1, 16, 16, 3))
    params, stats = _random_variables(model, x)

    path = str(tmp_path / "export.h5")
    export_keras_unet_h5(params, stats, path)

    fresh = model.init(jax.random.key(1), x)
    got_p, got_s = load_keras_unet_h5(path, fresh["params"], fresh["batch_stats"])
    _assert_trees_equal(got_p, params)
    _assert_trees_equal(got_s, stats)


def test_export_infer_arch_and_bytes_roundtrip():
    model = UNet(
        n_classes=5, filters=(4, 8, 16), factors=(2, 2, 2), head="softmax",
        convs_per_block=2,
    )
    x = jnp.zeros((1, 32, 32, 6))
    params, stats = _random_variables(model, x)

    blob = export_keras_unet_h5_bytes(params, stats)
    arch = infer_unet_arch(blob)
    assert arch == {
        "bands": 6,
        "filters": (4, 8, 16),
        "factors": (2, 2, 2),
        "convs_per_block": 2,
        "n_classes": 5,
    }
    fresh = model.init(jax.random.key(1), x)
    got_p, got_s = load_keras_unet_h5(blob, fresh["params"], fresh["batch_stats"])
    _assert_trees_equal(got_p, params)
    _assert_trees_equal(got_s, stats)


def test_export_keeps_forward_identical(tmp_path):
    model = UNet(n_classes=1, filters=(4, 8), factors=(2, 2), head="sigmoid")
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 16, 16, 3)).astype(np.float32)
    )
    params, stats = _random_variables(model, x)
    want = np.asarray(
        model.apply({"params": params, "batch_stats": stats}, x)["probs"]
    )

    path = str(tmp_path / "export.h5")
    export_keras_unet_h5(params, stats, path)
    fresh = model.init(jax.random.key(1), x)
    got_p, got_s = load_keras_unet_h5(path, fresh["params"], fresh["batch_stats"])
    got = np.asarray(model.apply({"params": got_p, "batch_stats": got_s}, x)["probs"])
    np.testing.assert_array_equal(got, want)


def test_export_rejects_s2d_tree(tmp_path):
    model = UNet(
        n_classes=1, filters=(4, 8), factors=(2, 2), head="sigmoid",
        space_to_depth=True,
    )
    x = jnp.zeros((1, 16, 16, 3))
    variables = model.init(jax.random.key(0), x)
    with pytest.raises(ValueError, match="space_to_depth"):
        export_keras_unet_h5(
            variables["params"], variables["batch_stats"], str(tmp_path / "x.h5")
        )


def test_export_rejects_folded_tree(tmp_path):
    from satellite_computervision_tpu.models.fold import fold_unet_variables

    model = UNet(n_classes=1, filters=(4, 8), factors=(2, 2), head="sigmoid")
    x = jnp.zeros((1, 16, 16, 3))
    variables = model.init(jax.random.key(0), x)
    _, folded = fold_unet_variables(model, variables)
    with pytest.raises(ValueError, match="fold"):
        export_keras_unet_h5(folded["params"], {}, str(tmp_path / "x.h5"))


@pytest.mark.parametrize("convs_per_block", [1, 2])
def test_siamese_export_import_roundtrip_bitwise(tmp_path, convs_per_block):
    from satellite_computervision_tpu.models import SiameseUNet
    from satellite_computervision_tpu.train.keras_export import (
        export_keras_siamese_h5,
        export_keras_siamese_h5_bytes,
    )
    from satellite_computervision_tpu.train.keras_import import (
        load_keras_siamese_h5,
    )

    model = SiameseUNet(
        filters=(4, 8), factors=(2, 2), convs_per_block=convs_per_block
    )
    x = jnp.zeros((1, 16, 16, 3))
    params, stats = _random_variables(model, x, x)

    path = str(tmp_path / "siamese.h5")
    export_keras_siamese_h5(params, stats, path)
    fresh = model.init(jax.random.key(1), x, x)
    got_p, got_s = load_keras_siamese_h5(
        path, fresh["params"], fresh["batch_stats"]
    )
    _assert_trees_equal(got_p, params)
    _assert_trees_equal(got_s, stats)

    # bytes variant roundtrips identically
    blob = export_keras_siamese_h5_bytes(params, stats)
    got_p2, got_s2 = load_keras_siamese_h5(
        blob, fresh["params"], fresh["batch_stats"]
    )
    _assert_trees_equal(got_p2, params)


def test_siamese_export_keeps_forward_identical(tmp_path):
    from satellite_computervision_tpu.models import SiameseUNet
    from satellite_computervision_tpu.train.keras_export import (
        export_keras_siamese_h5,
    )
    from satellite_computervision_tpu.train.keras_import import (
        load_keras_siamese_h5,
    )

    model = SiameseUNet(filters=(4, 8), factors=(2, 2))
    g = np.random.default_rng(7)
    xb = jnp.asarray(g.normal(size=(2, 16, 16, 3)).astype(np.float32))
    xa = jnp.asarray(g.normal(size=(2, 16, 16, 3)).astype(np.float32))
    params, stats = _random_variables(model, xb, xa)
    want = np.asarray(
        model.apply({"params": params, "batch_stats": stats}, xb, xa)["probs"]
    )

    path = str(tmp_path / "siamese.h5")
    export_keras_siamese_h5(params, stats, path)
    fresh = model.init(jax.random.key(1), xb, xa)
    got_p, got_s = load_keras_siamese_h5(
        path, fresh["params"], fresh["batch_stats"]
    )
    got = np.asarray(
        model.apply({"params": got_p, "batch_stats": got_s}, xb, xa)["probs"]
    )
    np.testing.assert_array_equal(got, want)


def test_siamese_export_rejects_non_siamese_tree(tmp_path):
    from satellite_computervision_tpu.train.keras_export import (
        export_keras_siamese_h5,
    )

    model = UNet(n_classes=1, filters=(4, 8), factors=(2, 2), head="sigmoid")
    variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
    with pytest.raises(ValueError, match="SiameseUNet"):
        export_keras_siamese_h5(
            variables["params"], variables["batch_stats"],
            str(tmp_path / "x.h5"),
        )


def _assert_trees_close(a, b, atol=3e-7):
    """Tree equality up to float rounding — the ConvLSTM forget-gate bias
    crosses the Keras(+1-stored) / cell(+1-at-runtime) convention on
    every roundtrip, which costs an ULP."""
    fa, ta = jax.tree_util.tree_flatten_with_path(a)
    fb, tb = jax.tree_util.tree_flatten_with_path(b)
    assert ta == tb
    for (pa, la), (_, lb) in zip(fa, fb):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=0, atol=atol,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_lstm_export_import_roundtrip(tmp_path):
    from satellite_computervision_tpu.models.convlstm import LSTMModel
    from satellite_computervision_tpu.train.keras_export import (
        export_keras_lstm_h5,
    )
    from satellite_computervision_tpu.train.keras_import import (
        load_keras_lstm_h5,
    )

    model = LSTMModel(n_classes=1, features=4)
    x = jnp.zeros((1, 3, 8, 8, 2))
    params, stats = _random_variables(model, x)

    path = str(tmp_path / "lstm.h5")
    export_keras_lstm_h5(params, stats, path)
    fresh = model.init(jax.random.key(1), x)
    got_p, got_s = load_keras_lstm_h5(
        path, fresh["params"], fresh["batch_stats"]
    )
    _assert_trees_close(got_p, params)
    _assert_trees_equal(got_s, stats)


def test_lstm_autoencoder_export_import_roundtrip(tmp_path):
    from satellite_computervision_tpu.models.convlstm import LSTMAutoencoder
    from satellite_computervision_tpu.train.keras_export import (
        export_keras_lstm_autoencoder_h5,
    )
    from satellite_computervision_tpu.train.keras_import import (
        load_keras_lstm_autoencoder_h5,
    )

    model = LSTMAutoencoder(n_classes=1, n_time=3, features=4)
    x = jnp.zeros((1, 3, 8, 8, 2))
    sincos = jnp.zeros((1, 8, 8, 2))
    params, stats = _random_variables(model, x, sincos)

    path = str(tmp_path / "lstm_ae.h5")
    export_keras_lstm_autoencoder_h5(params, stats, path)
    fresh = model.init(jax.random.key(1), x, sincos)
    got_p, got_s = load_keras_lstm_autoencoder_h5(
        path, fresh["params"], fresh["batch_stats"]
    )
    _assert_trees_close(got_p, params)
    _assert_trees_equal(got_s, stats)


@pytest.mark.parametrize("equal_dense_widths", [True, False])
def test_hybrid_export_import_roundtrip(tmp_path, equal_dense_widths):
    """Hybrid roundtrip with the dense 1x1s both shape-distinguishable
    (f0 != lstm features) and ambiguous (equal widths -> creation-order
    fallback in load_keras_hybrid_h5)."""
    from satellite_computervision_tpu.models.hybrid import HybridUNetLSTM
    from satellite_computervision_tpu.train.keras_export import (
        export_keras_hybrid_h5,
    )
    from satellite_computervision_tpu.train.keras_import import (
        load_keras_hybrid_h5,
    )

    lstm_f = 4 if equal_dense_widths else 6
    model = HybridUNetLSTM(
        n_classes=3, filters=(4, 8), factors=(2, 2), lstm_features=lstm_f,
        convs_per_block=1,
    )
    ux = jnp.zeros((1, 16, 16, 3))
    lx = jnp.zeros((1, 3, 8, 8, 2))
    params, stats = _random_variables(model, ux, lx)

    path = str(tmp_path / "hybrid.h5")
    export_keras_hybrid_h5(params, stats, path)
    fresh = model.init(jax.random.key(1), ux, lx)
    got_p, got_s = load_keras_hybrid_h5(
        path, fresh["params"], fresh["batch_stats"]
    )
    _assert_trees_close(got_p, params)
    _assert_trees_equal(got_s, stats)


def test_lstm_export_rejects_wrong_tree(tmp_path):
    from satellite_computervision_tpu.train.keras_export import (
        export_keras_hybrid_h5,
        export_keras_lstm_autoencoder_h5,
        export_keras_lstm_h5,
    )

    model = UNet(n_classes=1, filters=(4, 8), factors=(2, 2), head="sigmoid")
    variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
    for fn, pat in (
        (export_keras_lstm_h5, "LSTMModel"),
        (export_keras_lstm_autoencoder_h5, "LSTMAutoencoder"),
        (export_keras_hybrid_h5, "HybridUNetLSTM"),
    ):
        with pytest.raises(ValueError, match=pat):
            fn(variables["params"], variables["batch_stats"],
               str(tmp_path / "x.h5"))


@pytest.mark.skipif(not RUN_TF, reason="set SCV_TF_PARITY=1 to run TF parity tests")
def test_tf_lstm_load_weights_exact_forward_parity(tmp_path):
    """tf.keras get_lstm_model `load_weights` an exported LSTMModel .h5
    and must reproduce this framework's forward outputs."""
    import tensorflow as tf  # noqa: F401

    from test_keras_import_lstm import (
        C_IN,
        F,
        T,
        _legacy_hard_sigmoid_keras,
        build_ref_lstm_tf,
    )

    from satellite_computervision_tpu.models.convlstm import LSTMModel
    from satellite_computervision_tpu.train.keras_export import (
        export_keras_lstm_h5,
    )

    model = LSTMModel(n_classes=1, features=F)
    g = np.random.default_rng(17)
    x = (g.normal(size=(2, T, 8, 8, C_IN)) * 0.5).astype(np.float32)
    params, stats = _random_variables(model, jnp.asarray(x))
    want = np.asarray(
        model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
    )

    path = str(tmp_path / "lstm_export.h5")
    export_keras_lstm_h5(params, stats, path)
    m = build_ref_lstm_tf(_legacy_hard_sigmoid_keras())
    m.load_weights(path)
    got = m.predict(x, verbose=0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


@pytest.mark.skipif(not RUN_TF, reason="set SCV_TF_PARITY=1 to run TF parity tests")
def test_tf_lstm_ae_load_weights_exact_forward_parity(tmp_path):
    """tf.keras get_lstm_autoencoder `load_weights` an exported
    LSTMAutoencoder .h5 (TimeDistributed temporal head included) and must
    reproduce this framework's two head outputs."""
    import tensorflow as tf  # noqa: F401

    from test_keras_import_lstm import (
        C_IN,
        F,
        T,
        _legacy_hard_sigmoid_keras,
        build_ref_lstm_ae_tf,
    )

    from satellite_computervision_tpu.models.convlstm import LSTMAutoencoder
    from satellite_computervision_tpu.train.keras_export import (
        export_keras_lstm_autoencoder_h5,
    )

    model = LSTMAutoencoder(n_classes=1, n_time=T, features=F)
    g = np.random.default_rng(19)
    x = (g.normal(size=(2, T, 8, 8, C_IN)) * 0.5).astype(np.float32)
    sincos = (g.normal(size=(2, 8, 8, 2)) * 0.5).astype(np.float32)
    params, stats = _random_variables(model, jnp.asarray(x), jnp.asarray(sincos))
    out = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x), jnp.asarray(sincos),
    )

    path = str(tmp_path / "lstm_ae_export.h5")
    export_keras_lstm_autoencoder_h5(params, stats, path)
    m = build_ref_lstm_ae_tf(_legacy_hard_sigmoid_keras())
    m.load_weights(path)
    got_temporal, got_single = m.predict([x, sincos], verbose=0)
    np.testing.assert_allclose(
        got_temporal, np.asarray(out["temporal"]), rtol=1e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        got_single, np.asarray(out["single"]), rtol=1e-4, atol=2e-4
    )


@pytest.mark.skipif(not RUN_TF, reason="set SCV_TF_PARITY=1 to run TF parity tests")
def test_tf_siamese_load_weights_exact_forward_parity(tmp_path):
    """Hand-back for change detection: a reference-architecture tf.keras
    Siamese U-Net `load_weights` the exported .h5 and must reproduce this
    framework's forward outputs."""
    import tensorflow as tf  # noqa: F401

    from test_keras_import import build_ref_siamese_tf

    from satellite_computervision_tpu.models import SiameseUNet

    bands, filters, factors = 4, (4, 8), (2, 2)
    m = build_ref_siamese_tf(bands, filters, factors)

    model = SiameseUNet(filters=filters, factors=factors, convs_per_block=1)
    g = np.random.default_rng(13)
    xa = (g.normal(size=(2, 32, 32, bands)) * 0.5).astype(np.float32)
    xb = (g.normal(size=(2, 32, 32, bands)) * 0.5).astype(np.float32)
    params, stats = _random_variables(model, jnp.asarray(xb), jnp.asarray(xa))
    want = np.asarray(
        model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(xb), jnp.asarray(xa),
        )["probs"]
    )

    from satellite_computervision_tpu.train.keras_export import (
        export_keras_siamese_h5,
    )

    path = str(tmp_path / "siamese_export.h5")
    export_keras_siamese_h5(params, stats, path)
    m.load_weights(path)
    # reference input order: input_a = after (T2), input_b = before (T1)
    got = m.predict([xa, xb], verbose=0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not RUN_TF, reason="set SCV_TF_PARITY=1 to run TF parity tests")
def test_tf_load_weights_exact_forward_parity(tmp_path):
    """The hand-back check: a reference-architecture tf.keras binary U-Net
    `load_weights` the exported .h5 (Keras legacy topological loader) and
    must produce this framework's forward outputs exactly."""
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import tensorflow as tf  # noqa: F401
    from tensorflow.keras import layers, models

    class conv_batch_act(layers.Layer):
        def __init__(self, nf, **kw):
            super().__init__(**kw)
            self.conv_layer = layers.Conv2D(nf, (3, 3), padding="same")
            self.bn_layer = layers.BatchNormalization()
            self.act = layers.Activation("relu")

        def call(self, x):
            return self.act(self.bn_layer(self.conv_layer(x)))

    class conv_block(layers.Layer):
        def __init__(self, nf, name="conv_block", **kw):
            super().__init__(name=name, **kw)
            self.cba1 = conv_batch_act(nf)
            self.cba2 = conv_batch_act(nf)

        def call(self, x):
            y = self.cba1(x)
            y = self.cba1(x)  # the reference's double-call bug, faithfully
            return y

    class encoder_block(layers.Layer):
        def __init__(self, nf, name="encoder_block", **kw):
            super().__init__(name=name, **kw)
            self.encoder = conv_block(nf)
            self.pooler = layers.MaxPooling2D((2, 2), strides=(2, 2))

        def call(self, x):
            e = self.encoder(x)
            return self.pooler(e), e

    def decoder_block(x, concat, nf):
        d = layers.Conv2DTranspose(nf, (2, 2), strides=(2, 2), padding="same")(x)
        d = layers.concatenate([concat, d], axis=-1)
        d = layers.BatchNormalization()(d)
        d = layers.Activation("relu")(d)
        for _ in range(2):
            d = layers.Conv2D(nf, (3, 3), padding="same")(d)
            d = layers.BatchNormalization()(d)
            d = layers.Activation("relu")(d)
        return d

    bands, f0, f1 = 4, 4, 8
    inputs = layers.Input(shape=[None, None, bands])
    p0, e0 = encoder_block(f0, name="encoder_0")(inputs)
    p1, e1 = encoder_block(f1, name="encoder_1")(p0)
    center = conv_block(f1 * 2)(p1)
    d1 = decoder_block(center, e1, f1)
    d0 = decoder_block(d1, e0, f0)
    logits = layers.Conv2D(1, (1, 1), activation="sigmoid", name="logits")(d0)
    m = models.Model(inputs=inputs, outputs=[logits])

    model = UNet(
        n_classes=1, filters=(f0, f1), factors=(2, 2), head="sigmoid",
        convs_per_block=1,
    )
    x = np.random.default_rng(11).normal(size=(2, 32, 32, bands)).astype(np.float32)
    params, stats = _random_variables(model, jnp.asarray(x))
    want = np.asarray(
        model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))["probs"]
    )

    path = str(tmp_path / "export.h5")
    export_keras_unet_h5(params, stats, path)
    m.load_weights(path)
    got = m.predict(x, verbose=0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
