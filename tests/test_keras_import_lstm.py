"""Keras .h5 -> flax import for the timeseries families (ConvLSTM/hybrid).

Structural tests craft the reference builders' saved layouts by hand
(no TF import); exact-forward parity tests build the actual reference
models in tf.keras (get_lstm_model / get_lstm_autoencoder /
get_hybrid_model, utils/model_tools.py:666-920), save .h5, import, and
require matching outputs. TF tests are opt-in via SCV_TF_PARITY=1.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

h5py = pytest.importorskip("h5py")

from satellite_computervision_tpu.models.convlstm import LSTMAutoencoder, LSTMModel
from satellite_computervision_tpu.models.hybrid import HybridUNetLSTM
from satellite_computervision_tpu.train.keras_import import (
    load_keras_hybrid_h5,
    load_keras_lstm_autoencoder_h5,
    load_keras_lstm_h5,
)

RUN_TF = os.environ.get("SCV_TF_PARITY") == "1"

F = 4       # lstm features (reference uses 64/16; small for CI)
C_IN = 2    # timeseries bands
T = 3       # timesteps


def _write_keras2_h5(path, layers):
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array([n.encode() for n, _ in layers])
        for lname, weights in layers:
            g = f.create_group(lname)
            g.attrs["weight_names"] = np.array([w.encode() for w, _ in weights])
            for wname, arr in weights:
                g.create_dataset(wname, data=arr)


def _convlstm_w(rng, parent, cin, feats):
    return [
        (f"{parent}/kernel:0", rng.normal(size=(3, 3, cin, 4 * feats)).astype(np.float32) * 0.2),
        (f"{parent}/recurrent_kernel:0", rng.normal(size=(3, 3, feats, 4 * feats)).astype(np.float32) * 0.2),
        (f"{parent}/bias:0", rng.normal(size=(4 * feats,)).astype(np.float32) * 0.1),
    ]


def _bn_w(rng, parent, ch):
    return [
        (f"{parent}/gamma:0", rng.uniform(0.5, 1.5, ch).astype(np.float32)),
        (f"{parent}/beta:0", rng.normal(size=ch).astype(np.float32) * 0.1),
        (f"{parent}/moving_mean:0", rng.normal(size=ch).astype(np.float32) * 0.1),
        (f"{parent}/moving_variance:0", rng.uniform(0.5, 1.5, ch).astype(np.float32)),
    ]


def _conv_w(rng, parent, cin, cout, k=1):
    return [
        (f"{parent}/kernel:0", rng.normal(size=(k, k, cin, cout)).astype(np.float32) * 0.2),
        (f"{parent}/bias:0", rng.normal(size=(cout,)).astype(np.float32) * 0.1),
    ]


def test_structural_lstm_import(tmp_path, rng):
    path = str(tmp_path / "lstm.h5")
    layers = [
        ("conv_lstm", _convlstm_w(rng, "conv_lstm", C_IN, F)),
        ("batch_norm", _bn_w(rng, "batch_norm", F)),
        ("dilated_conv_lstm", _convlstm_w(rng, "dilated_conv_lstm", F, F)),
        ("batch_norm2", _bn_w(rng, "batch_norm2", F)),
        ("conv2d", _conv_w(rng, "conv2d", F, 1)),
        ("re_lu", []),
    ]
    _write_keras2_h5(path, layers)

    model = LSTMModel(n_classes=1, features=F)
    x = jnp.zeros((1, T, 8, 8, C_IN))
    variables = model.init(jax.random.key(0), x)
    params, stats = load_keras_lstm_h5(path, variables["params"], variables["batch_stats"])

    with h5py.File(path, "r") as f:
        want_k = np.asarray(f["conv_lstm"]["conv_lstm/kernel:0"])
        want_b = np.asarray(f["conv_lstm"]["conv_lstm/bias:0"])
        want_rec2 = np.asarray(f["dilated_conv_lstm"]["dilated_conv_lstm/recurrent_kernel:0"])
        want_gamma2 = np.asarray(f["batch_norm2"]["batch_norm2/gamma:0"])
        want_head = np.asarray(f["conv2d"]["conv2d/kernel:0"])

    stack = params["LSTMStack_0"]
    np.testing.assert_allclose(
        np.asarray(stack["ConvLSTM_0"]["cell"]["input_conv"]["kernel"]), want_k
    )
    # keras' stored unit forget bias (gate quarter 2) minus the runtime +1
    got_b = np.asarray(stack["ConvLSTM_0"]["cell"]["input_conv"]["bias"])
    np.testing.assert_allclose(got_b[:F], want_b[:F])
    np.testing.assert_allclose(got_b[F : 2 * F], want_b[F : 2 * F] - 1.0, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(stack["ConvLSTM_1"]["cell"]["recurrent_conv"]["kernel"]), want_rec2
    )
    np.testing.assert_allclose(np.asarray(stack["BatchNorm_1"]["scale"]), want_gamma2)
    np.testing.assert_allclose(np.asarray(params["Conv_0"]["kernel"]), want_head)

    out = model.apply({"params": params, "batch_stats": stats}, x)
    assert np.isfinite(np.asarray(out)).all()


def test_structural_lstm_autoencoder_import(tmp_path, rng):
    path = str(tmp_path / "lstm_ae.h5")
    layers = [
        ("conv_lstm", _convlstm_w(rng, "conv_lstm", C_IN, F)),
        ("batch_norm", _bn_w(rng, "batch_norm", F)),
        ("dilated_conv_lstm", _convlstm_w(rng, "dilated_conv_lstm", F, F)),
        ("batch_norm2", _bn_w(rng, "batch_norm2", F)),
        ("lstm_decoder", _convlstm_w(rng, "lstm_decoder", F, 32)),
        ("time_distributed", _conv_w(rng, "time_distributed/temporal_dense", 32, 1)),
        ("single_dense", _conv_w(rng, "single_dense", F + 2, 1)),
    ]
    _write_keras2_h5(path, layers)

    model = LSTMAutoencoder(n_classes=1, n_time=T, features=F)
    x = jnp.zeros((1, T, 8, 8, C_IN))
    sincos = jnp.zeros((1, 8, 8, 2))
    variables = model.init(jax.random.key(0), x, sincos)
    params, stats = load_keras_lstm_autoencoder_h5(
        path, variables["params"], variables["batch_stats"]
    )

    with h5py.File(path, "r") as f:
        want_dec = np.asarray(f["lstm_decoder"]["lstm_decoder/kernel:0"])
        want_temporal = np.asarray(
            f["time_distributed"]["time_distributed/temporal_dense/kernel:0"]
        )
        want_single = np.asarray(f["single_dense"]["single_dense/kernel:0"])

    np.testing.assert_allclose(
        np.asarray(params["lstm_decoder"]["cell"]["input_conv"]["kernel"]), want_dec
    )
    np.testing.assert_allclose(np.asarray(params["temporal_dense"]["kernel"]), want_temporal)
    np.testing.assert_allclose(np.asarray(params["single_dense"]["kernel"]), want_single)

    out = model.apply({"params": params, "batch_stats": stats}, x, sincos)
    assert np.isfinite(np.asarray(out["temporal"])).all()
    assert np.isfinite(np.asarray(out["single"])).all()


def _hybrid_h5(path, rng, f0=4, f1=8, lstm_f=4, n_classes=3, unet_bands=3):
    layers = []
    for i, (cin, cout) in enumerate([(unet_bands, f0), (f0, f1)]):
        pfx = f"encoder_{i}/conv_block/conv_batch_act"
        layers.append(
            (f"encoder_{i}",
             _conv_w(rng, f"{pfx}/conv2d_{i}", cin, cout, k=3)
             + _bn_w(rng, f"{pfx}/batch_normalization_{i}", cout))
        )
    pfx = "conv_block/conv_batch_act"
    layers.append(
        ("conv_block",
         _conv_w(rng, f"{pfx}/conv2d_c", f1, f1 * 2, k=3)
         + _bn_w(rng, f"{pfx}/batch_normalization_c", f1 * 2))
    )

    def convT(parent, cin, cout):
        return [
            (f"{parent}/kernel:0", rng.normal(size=(2, 2, cout, cin)).astype(np.float32) * 0.2),
            (f"{parent}/bias:0", rng.normal(size=(cout,)).astype(np.float32) * 0.1),
        ]

    # decoder level 0: convT(16->8), bn(16), conv(16->8), bn, conv, bn
    layers += [
        ("conv2d_transpose", convT("conv2d_transpose", f1 * 2, f1)),
        ("batch_normalization_5", _bn_w(rng, "batch_normalization_5", f1 * 2)),
        ("conv2d_5", _conv_w(rng, "conv2d_5", f1 * 2, f1, k=3)),
        ("batch_normalization_6", _bn_w(rng, "batch_normalization_6", f1)),
        ("conv2d_6", _conv_w(rng, "conv2d_6", f1, f1, k=3)),
        ("batch_normalization_7", _bn_w(rng, "batch_normalization_7", f1)),
        ("conv2d_transpose_1", convT("conv2d_transpose_1", f1, f0)),
        ("batch_normalization_8", _bn_w(rng, "batch_normalization_8", f0 * 2)),
        ("conv2d_7", _conv_w(rng, "conv2d_7", f0 * 2, f0, k=3)),
        ("batch_normalization_9", _bn_w(rng, "batch_normalization_9", f0)),
        ("conv2d_8", _conv_w(rng, "conv2d_8", f0, f0, k=3)),
        ("batch_normalization_10", _bn_w(rng, "batch_normalization_10", f0)),
        # unet dense (created before the lstm branch in get_hybrid_model)
        ("conv2d_9", _conv_w(rng, "conv2d_9", f0, n_classes)),
        # named lstm stack
        ("conv_lstm", _convlstm_w(rng, "conv_lstm", C_IN, lstm_f)),
        ("batch_norm", _bn_w(rng, "batch_norm", lstm_f)),
        ("dilated_conv_lstm", _convlstm_w(rng, "dilated_conv_lstm", lstm_f, lstm_f)),
        ("batch_norm2", _bn_w(rng, "batch_norm2", lstm_f)),
        ("conv2d_10", _conv_w(rng, "conv2d_10", lstm_f, n_classes)),
        ("probabilities", _conv_w(rng, "probabilities", 2 * n_classes, n_classes)),
    ]
    _write_keras2_h5(path, layers)


def test_structural_hybrid_import(tmp_path, rng):
    path = str(tmp_path / "hybrid.h5")
    _hybrid_h5(path, rng)

    model = HybridUNetLSTM(
        n_classes=3, filters=(4, 8), factors=(2, 2), lstm_features=F,
        convs_per_block=1,
    )
    ux = jnp.zeros((1, 16, 16, 3))
    lx = jnp.zeros((1, T, 8, 8, C_IN))
    variables = model.init(jax.random.key(0), ux, lx)
    params, stats = load_keras_hybrid_h5(
        path, variables["params"], variables["batch_stats"]
    )

    with h5py.File(path, "r") as f:
        want_enc = np.asarray(
            f["encoder_0"]["encoder_0/conv_block/conv_batch_act/conv2d_0/kernel:0"]
        )
        want_ct = np.asarray(f["conv2d_transpose"]["conv2d_transpose/kernel:0"])
        want_unet_dense = np.asarray(f["conv2d_9"]["conv2d_9/kernel:0"])
        want_lstm_dense = np.asarray(f["conv2d_10"]["conv2d_10/kernel:0"])
        want_prob = np.asarray(f["probabilities"]["probabilities/kernel:0"])
        want_lstm_k = np.asarray(f["conv_lstm"]["conv_lstm/kernel:0"])

    np.testing.assert_allclose(
        np.asarray(
            params["unet"]["EncoderBlock_0"]["ConvBlock_0"]["ConvBNAct_0"]["Conv_0"]["kernel"]
        ),
        want_enc,
    )
    np.testing.assert_allclose(
        np.asarray(params["unet"]["DecoderBlock_0"]["ConvTranspose_0"]["kernel"]),
        want_ct[::-1, ::-1].transpose(0, 1, 3, 2),
    )
    np.testing.assert_allclose(np.asarray(params["unet_dense"]["kernel"]), want_unet_dense)
    np.testing.assert_allclose(np.asarray(params["lstm_dense"]["kernel"]), want_lstm_dense)
    np.testing.assert_allclose(np.asarray(params["probabilities"]["kernel"]), want_prob)
    np.testing.assert_allclose(
        np.asarray(
            params["LSTMStack_0"]["ConvLSTM_0"]["cell"]["input_conv"]["kernel"]
        ),
        want_lstm_k,
    )

    out = model.apply({"params": params, "batch_stats": stats}, ux, lx)
    probs = np.asarray(out["probs"])
    assert probs.shape == (1, 16, 16, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


def test_lstm_import_rejects_wrong_family(tmp_path, rng):
    path = str(tmp_path / "notlstm.h5")
    _write_keras2_h5(path, [("conv2d", _conv_w(rng, "conv2d", 3, 1))])
    model = LSTMModel(n_classes=1, features=F)
    variables = model.init(jax.random.key(0), jnp.zeros((1, T, 8, 8, C_IN)))
    with pytest.raises(ValueError, match="get_lstm_model"):
        load_keras_lstm_h5(path, variables["params"], variables["batch_stats"])


# ---------------------------------------------------------------------------
# exact forward parity vs tf.keras (opt-in)
# ---------------------------------------------------------------------------
def _legacy_hard_sigmoid_keras():
    import tensorflow as tf

    # Keras 3 changed hard_sigmoid to relu6(x+3)/6; the reference ran on
    # Keras 2.x (clip(0.2x + 0.5, 0, 1)) which our cell implements.
    return lambda x: tf.clip_by_value(0.2 * x + 0.5, 0.0, 1.0)


def _save_twin(build, m, path):
    """Legacy-h5 save chokes pickling a lambda recurrent_activation, so
    save a twin built with the string "hard_sigmoid" — the activation is
    config-only; the WEIGHTS (all the loader reads) are identical."""
    m2 = build("hard_sigmoid")
    m2.set_weights(m.get_weights())
    m2.save(path)


def _randomize_keras(m, seed=7):
    g = np.random.default_rng(seed)
    for v in m.weights:
        shape = v.shape.as_list()
        if "moving_variance" in v.name or "gamma" in v.name:
            v.assign(g.uniform(0.5, 1.5, shape).astype(np.float32))
        else:
            v.assign((g.normal(size=shape) * 0.2).astype(np.float32))


def build_ref_lstm_tf(hs):
    """get_lstm_model (utils/model_tools.py:773-808) in tf.keras — shared
    with test_keras_export for the hand-back direction. ``hs`` is the
    recurrent activation (legacy hard_sigmoid or the string)."""
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    from tensorflow.keras import layers, models

    # Keras 3 ConvLSTM requires static spatial dims
    inp = layers.Input((T, 8, 8, C_IN))
    y = layers.ConvLSTM2D(F, (3, 3), padding="same", activation=None,
                          recurrent_activation=hs, return_sequences=True,
                          name="conv_lstm")(inp)
    y = layers.BatchNormalization(name="batch_norm")(y)
    y = layers.Activation("relu")(y)
    y = layers.ConvLSTM2D(F, (3, 3), dilation_rate=(3, 3), padding="same",
                          activation=None, recurrent_activation=hs,
                          return_sequences=False, name="dilated_conv_lstm")(y)
    y = layers.BatchNormalization(name="batch_norm2")(y)
    y = layers.Activation("relu")(y)
    y = layers.Conv2D(1, (1, 1), padding="same")(y)
    out = layers.ReLU(max_value=2.0)(y)
    return models.Model(inputs=inp, outputs=out)


def build_ref_lstm_ae_tf(hs):
    """get_lstm_autoencoder (utils/model_tools.py:810-872) in tf.keras —
    shared with test_keras_export for the hand-back direction."""
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import keras
    from tensorflow.keras import layers, models

    lstm_in = layers.Input((T, 8, 8, C_IN), name="timeseries_input")
    sincos_in = layers.Input((8, 8, 2), name="sincos_input")

    seq, state_h, state_c = layers.ConvLSTM2D(
        F, (3, 3), padding="same", activation=None, recurrent_activation=hs,
        return_sequences=True, return_state=True, name="conv_lstm")(lstm_in)
    y = layers.BatchNormalization(name="batch_norm")(seq)
    y = layers.Activation("relu")(y)
    y = layers.ConvLSTM2D(F, (3, 3), dilation_rate=(3, 3), padding="same",
                          activation=None, recurrent_activation=hs,
                          return_sequences=False, name="dilated_conv_lstm")(y)
    y = layers.BatchNormalization(name="batch_norm2")(y)
    encoded = layers.Activation("relu")(state_h + y)

    repeated = keras.ops.repeat(keras.ops.expand_dims(encoded, axis=1), T, axis=1)
    decoded = layers.ConvLSTM2D(32, (3, 3), padding="same", activation=None,
                                recurrent_activation=hs, return_sequences=True,
                                name="lstm_decoder")(repeated)
    temporal_dense = layers.Conv2D(1, (1, 1), padding="same", name="temporal_dense")
    temporal = layers.TimeDistributed(temporal_dense)(decoded)
    temporal = layers.ReLU(max_value=2.0)(temporal)

    concat = layers.Concatenate(axis=-1, name="concat")([encoded, sincos_in])
    single = layers.Conv2D(1, (1, 1), padding="same", name="single_dense")(concat)
    single = layers.ReLU(max_value=2.0)(single)
    return models.Model(inputs=[lstm_in, sincos_in], outputs=[temporal, single])


@pytest.mark.skipif(not RUN_TF, reason="set SCV_TF_PARITY=1 to run TF parity tests")
def test_tf_lstm_exact_forward_parity(tmp_path, rng):
    """get_lstm_model (utils/model_tools.py:773-808) built in tf.keras,
    saved, imported; forward outputs must match — covering the dilated
    second ConvLSTM and the capped-ReLU head."""
    import tensorflow as tf  # noqa: F401

    build = build_ref_lstm_tf
    m = build(_legacy_hard_sigmoid_keras())
    _randomize_keras(m)

    path = str(tmp_path / "ref_lstm.h5")
    _save_twin(build, m, path)

    x = (rng.normal(size=(2, T, 8, 8, C_IN)) * 0.5).astype(np.float32)
    want = m.predict(x, verbose=0)

    model = LSTMModel(n_classes=1, features=F)
    variables = model.init(jax.random.key(0), jnp.asarray(x))
    params, stats = load_keras_lstm_h5(path, variables["params"], variables["batch_stats"])
    got = np.asarray(model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


@pytest.mark.skipif(not RUN_TF, reason="set SCV_TF_PARITY=1 to run TF parity tests")
def test_tf_lstm_autoencoder_exact_forward_parity(tmp_path, rng):
    """get_lstm_autoencoder (utils/model_tools.py:810-872) in tf.keras:
    residual state_h encoder, repeated-state ConvLSTM decoder, two heads."""
    import tensorflow as tf  # noqa: F401

    build = build_ref_lstm_ae_tf
    m = build(_legacy_hard_sigmoid_keras())
    _randomize_keras(m)

    path = str(tmp_path / "ref_lstm_ae.h5")
    _save_twin(build, m, path)

    x = (rng.normal(size=(2, T, 8, 8, C_IN)) * 0.5).astype(np.float32)
    sincos = (rng.normal(size=(2, 8, 8, 2)) * 0.5).astype(np.float32)
    want_temporal, want_single = m.predict([x, sincos], verbose=0)

    model = LSTMAutoencoder(n_classes=1, n_time=T, features=F)
    variables = model.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(sincos))
    params, stats = load_keras_lstm_autoencoder_h5(
        path, variables["params"], variables["batch_stats"]
    )
    out = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), jnp.asarray(sincos)
    )
    np.testing.assert_allclose(np.asarray(out["temporal"]), want_temporal,
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["single"]), want_single,
                               rtol=1e-4, atol=2e-4)


@pytest.mark.skipif(not RUN_TF, reason="set SCV_TF_PARITY=1 to run TF parity tests")
def test_tf_hybrid_exact_forward_parity(tmp_path, rng):
    """get_hybrid_model (utils/model_tools.py:874-920) in tf.keras — U-Net
    trunk (conv_block double-call bug included) + named LSTM stack +
    nearest-resize fusion under a softmax 1x1."""
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import tensorflow as tf
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
            y = self.cba1(x)  # the reference's double-call bug
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

    f0, f1, n_classes, unet_bands = 4, 8, 3, 3
    uh = uw = 16
    import keras

    def build(hs):
        unet_in = layers.Input((uh, uw, unet_bands))
        p0, e0 = encoder_block(f0, name="encoder_0")(unet_in)
        p1, e1 = encoder_block(f1, name="encoder_1")(p0)
        center = conv_block(f1 * 2)(p1)
        d1 = decoder_block(center, e1, f1)
        d0 = decoder_block(d1, e0, f0)
        unet_dense = layers.Conv2D(n_classes, (1, 1), activation="relu",
                                   padding="same")(d0)

        lstm_in = layers.Input((T, 8, 8, C_IN))
        y = layers.ConvLSTM2D(F, (3, 3), padding="same", activation=None,
                              recurrent_activation=hs, return_sequences=True,
                              name="conv_lstm")(lstm_in)
        y = layers.BatchNormalization(name="batch_norm")(y)
        y = layers.Activation("relu")(y)
        y = layers.ConvLSTM2D(F, (3, 3), dilation_rate=(3, 3), padding="same",
                              activation=None, recurrent_activation=hs,
                              return_sequences=False, name="dilated_conv_lstm")(y)
        y = layers.BatchNormalization(name="batch_norm2")(y)
        lstm_out = layers.Activation("relu")(y)
        lstm_dense = layers.Conv2D(n_classes, (1, 1), activation="relu",
                                   padding="same")(lstm_out)
        lstm_resized = keras.ops.image.resize(lstm_dense, (uh, uw),
                                              interpolation="nearest")

        fused = layers.concatenate([lstm_resized, unet_dense], axis=-1)
        probs = layers.Conv2D(n_classes, (1, 1), activation="softmax",
                              padding="same", name="probabilities")(fused)
        return models.Model(inputs=[unet_in, lstm_in], outputs=probs)

    m = build(_legacy_hard_sigmoid_keras())
    _randomize_keras(m)

    path = str(tmp_path / "ref_hybrid.h5")
    _save_twin(build, m, path)

    ux = (rng.normal(size=(2, uh, uw, unet_bands)) * 0.5).astype(np.float32)
    lx = (rng.normal(size=(2, T, 8, 8, C_IN)) * 0.5).astype(np.float32)
    want = m.predict([ux, lx], verbose=0)

    model = HybridUNetLSTM(
        n_classes=n_classes, filters=(f0, f1), factors=(2, 2), lstm_features=F,
        convs_per_block=1,
    )
    variables = model.init(jax.random.key(0), jnp.asarray(ux), jnp.asarray(lx))
    params, stats = load_keras_hybrid_h5(
        path, variables["params"], variables["batch_stats"]
    )
    got = np.asarray(
        model.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(ux), jnp.asarray(lx))["probs"]
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)
