"""Keras .h5 -> flax weight import (train/keras_import.py).

The structural test crafts a Keras-2-layout HDF5 by hand (no TF import);
the exact-forward parity test builds the reference's binary U-Net in
tf.keras — including the conv_block double-call bug
(utils/model_tools.py:238-239) — saves it, imports it, and compares
outputs. The TF test is opt-in via SCV_TF_PARITY=1 (TF import costs ~50 s).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

h5py = pytest.importorskip("h5py")

from satellite_computervision_tpu.models import UNet
from satellite_computervision_tpu.train.keras_import import (
    load_keras_unet_h5,
    read_keras_h5_units,
)

RUN_TF = os.environ.get("SCV_TF_PARITY") == "1"


def _write_keras2_h5(path, layers):
    """layers: [(layer_name, [(weight_path, array), ...])] in Keras-2
    save_weights layout: root attrs layer_names; per-layer weight_names."""
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array([n.encode() for n, _ in layers])
        for lname, weights in layers:
            g = f.create_group(lname)
            g.attrs["weight_names"] = np.array([w.encode() for w, _ in weights])
            for wname, arr in weights:
                g.create_dataset(wname, data=arr)


def _synthetic_ref_unet_h5(path, rng, bands=3, filters=(4, 8)):
    """Hand-build the reference binary U-Net's saved layout (encoder_block
    Layer groups with one effective conv_batch_act, center conv_block,
    functional decoder levels, head conv)."""

    def conv(parent, cin, cout, k=3):
        return [
            (f"{parent}/kernel:0", rng.normal(size=(k, k, cin, cout)).astype(np.float32) * 0.2),
            (f"{parent}/bias:0", rng.normal(size=(cout,)).astype(np.float32) * 0.1),
        ]

    def bn(parent, ch):
        return [
            (f"{parent}/gamma:0", rng.uniform(0.5, 1.5, ch).astype(np.float32)),
            (f"{parent}/beta:0", rng.normal(size=ch).astype(np.float32) * 0.1),
            (f"{parent}/moving_mean:0", rng.normal(size=ch).astype(np.float32) * 0.1),
            (f"{parent}/moving_variance:0", rng.uniform(0.5, 1.5, ch).astype(np.float32)),
        ]

    def convT(parent, cin, cout):
        return [
            (f"{parent}/kernel:0", rng.normal(size=(2, 2, cout, cin)).astype(np.float32) * 0.2),
            (f"{parent}/bias:0", rng.normal(size=(cout,)).astype(np.float32) * 0.1),
        ]

    f0, f1 = filters
    layers = []
    # encoders (nested Layer groups, ONE conv_batch_act each — the bug)
    for i, (cin, cout) in enumerate([(bands, f0), (f0, f1)]):
        pfx = f"encoder_{i}/conv_block/conv_batch_act"
        layers.append(
            (f"encoder_{i}",
             conv(f"{pfx}/conv2d_{i}", cin, cout) + bn(f"{pfx}/batch_normalization_{i}", cout))
        )
    # center
    pfx = "conv_block/conv_batch_act"
    layers.append(
        ("conv_block", conv(f"{pfx}/conv2d_c", f1, f1 * 2) + bn(f"{pfx}/batch_normalization_c", f1 * 2))
    )
    # decoder level 0 (deepest): convT(f1), bn(concat f1+f1), 2x(conv f1 + bn)
    layers.append(("conv2d_transpose", convT("conv2d_transpose", f1 * 2, f1)))
    layers.append(("batch_normalization_5", bn("batch_normalization_5", f1 * 2)))
    layers.append(("conv2d_5", conv("conv2d_5", f1 * 2, f1)))
    layers.append(("batch_normalization_6", bn("batch_normalization_6", f1)))
    layers.append(("conv2d_6", conv("conv2d_6", f1, f1)))
    layers.append(("batch_normalization_7", bn("batch_normalization_7", f1)))
    # decoder level 1
    layers.append(("conv2d_transpose_1", convT("conv2d_transpose_1", f1, f0)))
    layers.append(("batch_normalization_8", bn("batch_normalization_8", f0 * 2)))
    layers.append(("conv2d_7", conv("conv2d_7", f0 * 2, f0)))
    layers.append(("batch_normalization_9", bn("batch_normalization_9", f0)))
    layers.append(("conv2d_8", conv("conv2d_8", f0, f0)))
    layers.append(("batch_normalization_10", bn("batch_normalization_10", f0)))
    # head
    layers.append(("logits", conv("logits", f0, 1, k=1)))
    # a weightless layer for good measure
    layers.append(("classes", []))
    _write_keras2_h5(path, layers)


def test_structural_import(tmp_path, rng):
    path = str(tmp_path / "ref.h5")
    _synthetic_ref_unet_h5(path, rng)

    units = read_keras_h5_units(path)
    assert [n for n, u in units if u][0] == "encoder_0"

    model = UNet(
        n_classes=1, filters=(4, 8), factors=(2, 2), head="sigmoid",
        convs_per_block=1,
    )
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.key(0), x)
    params, stats = load_keras_unet_h5(
        path, variables["params"], variables["batch_stats"]
    )

    with h5py.File(path, "r") as f:
        want_enc0 = np.asarray(f["encoder_0"]["encoder_0/conv_block/conv_batch_act/conv2d_0/kernel:0"])
        want_head = np.asarray(f["logits"]["logits/kernel:0"])
        want_ct = np.asarray(f["conv2d_transpose"]["conv2d_transpose/kernel:0"])
        want_bn5_mean = np.asarray(
            f["batch_normalization_5"]["batch_normalization_5/moving_mean:0"]
        )

    got_enc0 = params["EncoderBlock_0"]["ConvBlock_0"]["ConvBNAct_0"]["Conv_0"]["kernel"]
    np.testing.assert_allclose(np.asarray(got_enc0), want_enc0)
    np.testing.assert_allclose(np.asarray(params["head"]["kernel"]), want_head)
    # convT: spatial flip + (out,in)->(in,out)
    np.testing.assert_allclose(
        np.asarray(params["DecoderBlock_0"]["ConvTranspose_0"]["kernel"]),
        want_ct[::-1, ::-1].transpose(0, 1, 3, 2),
    )
    np.testing.assert_allclose(
        np.asarray(stats["DecoderBlock_0"]["BatchNorm_0"]["mean"]), want_bn5_mean
    )

    out = model.apply({"params": params, "batch_stats": stats}, x)
    assert np.isfinite(np.asarray(out["probs"])).all()


def test_import_detects_convs_per_block_mismatch(tmp_path, rng):
    path = str(tmp_path / "ref.h5")
    _synthetic_ref_unet_h5(path, rng)
    model = UNet(n_classes=1, filters=(4, 8), factors=(2, 2), convs_per_block=2)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    with pytest.raises(ValueError, match="convs_per_block"):
        load_keras_unet_h5(path, variables["params"], variables["batch_stats"])


@pytest.mark.skipif(not RUN_TF, reason="set SCV_TF_PARITY=1 to run TF parity tests")
def test_tf_exact_forward_parity(tmp_path, rng):
    """Build the reference binary U-Net in tf.keras (with the conv_block
    double-call bug), save .h5, import, and require identical forward
    outputs on a fixed input (reference utils/model_tools.py:417-454,
    :1204-1269)."""
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

    # randomize weights incl. BN stats so parity is non-trivial
    g = np.random.default_rng(7)
    for v in m.weights:
        shape = v.shape.as_list()
        if "moving_variance" in v.name or "gamma" in v.name:
            v.assign(g.uniform(0.5, 1.5, shape).astype(np.float32))
        else:
            v.assign((g.normal(size=shape) * 0.2).astype(np.float32))

    path = str(tmp_path / "ref_model.h5")
    m.save(path)

    x = (rng.normal(size=(2, 32, 32, bands)) * 0.5).astype(np.float32)
    want = m.predict(x, verbose=0)

    model = UNet(
        n_classes=1, filters=(f0, f1), factors=(2, 2), head="sigmoid",
        convs_per_block=1,
    )
    variables = model.init(jax.random.key(0), jnp.asarray(x))
    params, stats = load_keras_unet_h5(
        path, variables["params"], variables["batch_stats"]
    )
    got = np.asarray(
        model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))["probs"]
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not RUN_TF, reason="set SCV_TF_PARITY=1 to run TF parity tests")
def test_tf_multiclass_exact_forward_parity(tmp_path, rng):
    """Same as the binary parity test but for the multiclass softmax
    family (get_unet_model, utils/model_tools.py:394-415): the head is an
    n-class 1x1 softmax conv; importer must map it identically."""
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
            y = self.cba1(x)
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

    bands, f0, f1, n_classes = 3, 4, 8, 5
    inputs = layers.Input(shape=[None, None, bands])
    p0, e0 = encoder_block(f0, name="encoder_0")(inputs)
    p1, e1 = encoder_block(f1, name="encoder_1")(p0)
    center = conv_block(f1 * 2)(p1)
    d1 = decoder_block(center, e1, f1)
    d0 = decoder_block(d1, e0, f0)
    probs = layers.Conv2D(n_classes, (1, 1), activation="softmax", name="probs")(d0)
    m = models.Model(inputs=inputs, outputs=[probs])

    g = np.random.default_rng(11)
    for v in m.weights:
        shape = v.shape.as_list()
        if "moving_variance" in v.name or "gamma" in v.name:
            v.assign(g.uniform(0.5, 1.5, shape).astype(np.float32))
        else:
            v.assign((g.normal(size=shape) * 0.2).astype(np.float32))

    path = str(tmp_path / "ref_mc.h5")
    m.save(path)

    x = (rng.normal(size=(2, 32, 32, bands)) * 0.5).astype(np.float32)
    want = m.predict(x, verbose=0)

    model = UNet(
        n_classes=n_classes, filters=(f0, f1), factors=(2, 2), head="softmax",
        convs_per_block=1,
    )
    variables = model.init(jax.random.key(0), jnp.asarray(x))
    params, stats = load_keras_unet_h5(
        path, variables["params"], variables["batch_stats"]
    )
    got = np.asarray(
        model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))["probs"]
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def build_ref_siamese_tf(bands, filters, factors):
    """The reference Siamese U-Net (shared encoders + shared ASPP,
    utils/model_tools.py:576-663, conv_block double-call bug included) as
    a tf.keras Model — shared with test_keras_export for the hand-back
    direction. Requires TF already importable."""
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    from tensorflow.keras import layers, models

    class conv_batch_act(layers.Layer):
        def __init__(self, nf, kernel_size=(3, 3), dilation_rate=1, **kw):
            super().__init__(**kw)
            self.conv_layer = layers.Conv2D(
                nf, kernel_size, padding="same", dilation_rate=dilation_rate
            )
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
            y = self.cba1(x)  # reference double-call bug
            return y

    class encoder_block(layers.Layer):
        def __init__(self, nf, pool=(2, 2), name="encoder_block", **kw):
            super().__init__(name=name, **kw)
            self.encoder = conv_block(nf)
            self.pooler = layers.MaxPooling2D(pool, strides=pool)

        def call(self, x):
            e = self.encoder(x)
            return self.pooler(e), e

    class ASPP_layer(layers.Layer):
        def __init__(self, nf, name="ASPP", **kw):
            super().__init__(name=name, **kw)
            self.cba = conv_batch_act(nf, (1, 1), 1)
            self.cba2 = conv_batch_act(nf, (1, 1), 1)   # never called (ref)
            self.cba3 = conv_batch_act(nf, (1, 1), 1)
            self.cba3_3 = conv_batch_act(nf, (3, 3), 3)
            self.cba3_6 = conv_batch_act(nf, (3, 3), 6)
            self.cba3_12 = conv_batch_act(nf, (3, 3), 12)

        def call(self, x):
            out = layers.Concatenate(axis=-1)(
                [self.cba(x), self.cba3_3(x), self.cba3_6(x), self.cba3_12(x)]
            )
            return self.cba3(out)

    def decoder_block(x, concat, nf, up=(2, 2)):
        d = layers.Conv2DTranspose(nf, up, strides=up, padding="same")(x)
        d = layers.concatenate([concat, d], axis=-1)
        d = layers.BatchNormalization()(d)
        d = layers.Activation("relu")(d)
        for _ in range(2):
            d = layers.Conv2D(nf, (3, 3), padding="same")(d)
            d = layers.BatchNormalization()(d)
            d = layers.Activation("relu")(d)
        return d

    input_a = layers.Input((None, None, bands))
    input_b = layers.Input((None, None, bands))
    pooled_a, pooled_b = input_a, input_b
    net = {}
    for i, (filt, factor) in enumerate(zip(filters, factors)):
        enc = encoder_block(filt, (factor, factor), name=f"encoder_{i}")
        pooled_a, enc_a = enc(pooled_a)
        pooled_b, enc_b = enc(pooled_b)
        net[i] = layers.Concatenate(axis=-1)([enc_b, enc_a])
    aspp = ASPP_layer(filters[-1] * 2)
    squeezed = layers.Concatenate(axis=-1)([aspp(pooled_b), aspp(pooled_a)])
    d = squeezed
    for j in range(len(filters) - 1, -1, -1):
        d = decoder_block(d, net[j], filters[j], (factors[j], factors[j]))
    probs = layers.Conv2D(1, (1, 1), activation="sigmoid", name="probs")(d)
    return models.Model(inputs=[input_a, input_b], outputs=[probs])


@pytest.mark.skipif(not RUN_TF, reason="set SCV_TF_PARITY=1 to run TF parity tests")
def test_tf_siamese_exact_forward_parity(tmp_path, rng):
    """Reference Siamese U-Net in tf.keras -> .h5 -> load_keras_siamese_h5
    -> identical forward output."""
    import tensorflow as tf  # noqa: F401

    bands, filters, factors = 4, (4, 8), (2, 2)
    m = build_ref_siamese_tf(bands, filters, factors)

    g = np.random.default_rng(11)
    for v in m.weights:
        shape = v.shape.as_list()
        if "moving_variance" in v.name or "gamma" in v.name:
            v.assign(g.uniform(0.5, 1.5, shape).astype(np.float32))
        else:
            v.assign((g.normal(size=shape) * 0.2).astype(np.float32))
    path = str(tmp_path / "siamese.h5")
    m.save(path)

    xa = (rng.normal(size=(2, 32, 32, bands)) * 0.5).astype(np.float32)
    xb = (rng.normal(size=(2, 32, 32, bands)) * 0.5).astype(np.float32)
    want = m.predict([xa, xb], verbose=0)

    from satellite_computervision_tpu.models import SiameseUNet
    from satellite_computervision_tpu.train.keras_import import load_keras_siamese_h5

    model = SiameseUNet(filters=filters, factors=factors, convs_per_block=1)
    # model(before, after): reference input_a is T2 (after), input_b T1
    variables = model.init(jax.random.key(0), jnp.asarray(xb), jnp.asarray(xa))
    params, stats = load_keras_siamese_h5(
        path, variables["params"], variables["batch_stats"]
    )
    got = np.asarray(
        model.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(xb), jnp.asarray(xa)
        )["probs"]
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_get_blob_model_streams_h5_over_http(tmp_path, rng):
    """compat.get_blob_model with an .h5 URL fetches and maps Keras weights
    (utils/model_tools.py:1204-1269's Azure-blob streaming, over stdlib
    http here)."""
    import functools
    import http.server
    import threading

    path = str(tmp_path / "ref.h5")
    _synthetic_ref_unet_h5(path, rng)

    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(tmp_path)
    )
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}/ref.h5?sig=abc"
        from satellite_computervision_tpu import compat

        model = UNet(n_classes=1, filters=(4, 8), factors=(2, 2),
                     head="sigmoid", convs_per_block=1)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        params, stats = compat.get_blob_model(
            model_url=url, target=variables["params"],
            batch_stats=variables["batch_stats"],
        )
        with h5py.File(path, "r") as f:
            want = np.asarray(f["logits"]["logits/kernel:0"])
        np.testing.assert_allclose(np.asarray(params["head"]["kernel"]), want)
    finally:
        server.shutdown()
