"""Golden parity vs TensorFlow's own ops (the reference's substrate).

The reference implements its math with TF primitives; these tests check
our JAX implementations against the same TF primitives directly —
tf.nn.moments-based normalization, tf.image flips/rot, weighted CE with
logits, one_hot — establishing the "bit-for-band" contract (SURVEY.md §4)
without importing any reference code.

Slow (imports TensorFlow): enabled with SCV_TF_PARITY=1.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tf_parity

if not os.environ.get("SCV_TF_PARITY"):
    pytest.skip("set SCV_TF_PARITY=1 to run TF parity tests", allow_module_level=True)

import tensorflow as tf  # noqa: E402

from satellite_computervision_tpu.models import losses  # noqa: E402
from satellite_computervision_tpu.ops import (  # noqa: E402
    apply_morph,
    calc_ndvi,
    normalize_image,
    one_hot,
    rescale_image,
)


@pytest.fixture(scope="module")
def img():
    return np.random.default_rng(0).uniform(0, 10000, (32, 32, 6)).astype(np.float32)


@pytest.mark.parametrize("axes", [[2], [0, 1], [0, 1, 2]])
def test_normalize_matches_tf_moments(img, axes):
    mean, var = tf.nn.moments(tf.constant(img), axes, keepdims=True)
    want = ((img - mean.numpy()) / np.sqrt(var.numpy() + 1e-8)).astype(np.float32)
    got = np.asarray(normalize_image(img, axes=tuple(axes)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize("axes", [[2], [0, 1]])
def test_rescale_matches_tf(img, axes):
    t = tf.constant(img)
    lo = tf.reduce_min(t, axis=axes, keepdims=True)
    hi = tf.reduce_max(t, axis=axes, keepdims=True)
    want = ((img - lo.numpy()) / (hi.numpy() - lo.numpy() + 1e-8)).astype(np.float32)
    got = np.asarray(rescale_image(img, axes=tuple(axes)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)


def test_morph_matches_tf_image(img):
    for fv in (False, True):
        for fh in (False, True):
            for r in range(4):
                t = tf.constant(img)
                if fv:
                    t = tf.image.flip_up_down(t)
                if fh:
                    t = tf.image.flip_left_right(t)
                t = tf.image.rot90(t, r)
                got = np.asarray(
                    apply_morph(img, jnp.asarray(fv), jnp.asarray(fh), jnp.asarray(r))
                )
                np.testing.assert_allclose(got, t.numpy(), rtol=1e-6)


def test_weighted_bce_logits_matches_tf():
    rng = np.random.default_rng(1)
    y = (rng.uniform(size=(128,)) > 0.5).astype(np.float32)
    logits = rng.normal(0, 3, (128,)).astype(np.float32)
    want = float(
        tf.reduce_mean(
            tf.nn.weighted_cross_entropy_with_logits(
                labels=tf.constant(y), logits=tf.constant(logits), pos_weight=5.0
            )
        )
    )
    got = float(losses.weighted_bce(y, logits, pos_weight=5.0, logits=True))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_one_hot_matches_tf():
    labels = np.array([[0, 3], [7, 2]], np.float32)
    want = tf.one_hot(tf.cast(tf.constant(labels), tf.uint8), 5).numpy()
    got = np.asarray(one_hot(labels, 5))
    np.testing.assert_array_equal(got, want)


def test_convlstm_matches_keras():
    """Our scanned ConvLSTM cell vs keras ConvLSTM2D with identical
    weights and the reference's configuration (activation=None,
    hard_sigmoid recurrent activation, unit forget bias)."""
    import jax

    from satellite_computervision_tpu.models.convlstm import ConvLSTM

    rng = np.random.default_rng(5)
    b, t, h, w, c, f = 2, 3, 8, 8, 3, 4
    x = rng.normal(0, 0.5, (b, t, h, w, c)).astype(np.float32)

    ours = ConvLSTM(features=f, return_sequences=True)
    variables = ours.init(jax.random.key(0), jnp.asarray(x))
    seq_ours, (c_last, h_last) = ours.apply(variables, jnp.asarray(x))

    cell = variables["params"]["cell"]
    kernel = np.asarray(cell["input_conv"]["kernel"])       # (3,3,C,4F)
    rec_kernel = np.asarray(cell["recurrent_conv"]["kernel"])  # (3,3,F,4F)
    bias = np.asarray(cell["input_conv"]["bias"])           # (4F,)

    # Keras 3 redefined hard_sigmoid as relu6(x+3)/6; the reference ran on
    # Keras 2.x whose hard_sigmoid was clip(0.2x + 0.5, 0, 1) — pin that
    # form (which our cell implements) explicitly.
    legacy_hard_sigmoid = lambda x: tf.clip_by_value(0.2 * x + 0.5, 0.0, 1.0)
    keras_layer = tf.keras.layers.ConvLSTM2D(
        filters=f, kernel_size=(3, 3), padding="same",
        activation=None, recurrent_activation=legacy_hard_sigmoid,
        return_sequences=True, return_state=True, unit_forget_bias=True,
    )
    keras_layer.build((b, t, h, w, c))
    # keras gate order is i, f, c, o — same as our split; keras adds its
    # stored forget bias (init 1) while our cell adds the constant 1, so
    # copy our bias and bump the forget block by +1.
    kbias = bias.copy()
    kbias[f : 2 * f] += 1.0
    keras_layer.set_weights([kernel, rec_kernel, kbias])
    seq_tf, h_tf, c_tf = keras_layer(tf.constant(x))

    np.testing.assert_allclose(np.asarray(seq_ours), seq_tf.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(h_last), h_tf.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(c_last), c_tf.numpy(), atol=2e-4)


def test_hsv_conversions_match_tf():
    from satellite_computervision_tpu.ops import hsv_to_rgb, rgb_to_hsv

    rng = np.random.default_rng(3)
    rgb = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    hsv_tf = tf.image.rgb_to_hsv(tf.constant(rgb)).numpy()
    np.testing.assert_allclose(np.asarray(rgb_to_hsv(rgb)), hsv_tf, atol=1e-5)
    back_tf = tf.image.hsv_to_rgb(tf.constant(hsv_tf)).numpy()
    np.testing.assert_allclose(np.asarray(hsv_to_rgb(hsv_tf)), back_tf, atol=1e-5)


def test_aug_color_hsv_valid_range():
    from satellite_computervision_tpu.ops import aug_color_hsv

    rng = np.random.default_rng(4)
    rgb = rng.uniform(0.2, 0.8, (16, 16, 3)).astype(np.float32)
    out = np.asarray(aug_color_hsv(jax.random.key(0), rgb))
    assert out.shape == rgb.shape and np.isfinite(out).all()
    # same key -> same result; different key -> different
    out2 = np.asarray(aug_color_hsv(jax.random.key(0), rgb))
    np.testing.assert_array_equal(out, out2)
    assert not np.array_equal(out, np.asarray(aug_color_hsv(jax.random.key(1), rgb)))


def test_ndvi_matches_tf():
    rng = np.random.default_rng(2)
    nir = rng.uniform(0, 1, (16, 16)).astype(np.float32)
    red = rng.uniform(0, 1, (16, 16)).astype(np.float32)
    want = (
        tf.divide(
            tf.subtract(nir, red), tf.add(1e-8, tf.add(nir, red))
        ).numpy()
    )
    got = np.asarray(calc_ndvi(nir, red))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)


def test_train_trajectory_matches_keras(tmp_path):
    """Optimization-trajectory parity for the solar config (VERDICT r4 #4):
    identical init (weights round-tripped through the .h5 importer),
    identical batches, 20 Adam steps of the probability-form weighted BCE
    (get_weighted_bce, utils/model_tools.py:96-112 + the commented compile
    at :1141-1148) in tf.keras vs this Trainer's train step — per-step
    losses must track within float32 tolerance.

    Known deltas, pinned equal here rather than papered over: Adam epsilon
    (Keras 1e-7 vs optax's 1e-8 default — the test passes eps=1e-7) and BN
    momentum/epsilon (Keras 0.99/1e-3 are already this model's defaults,
    models/blocks.py). Everything runs float32; bf16 would add
    quantization noise unrelated to trajectory parity."""
    import optax
    from tensorflow.keras import layers, models

    from satellite_computervision_tpu.models import UNet
    from satellite_computervision_tpu.train import create_train_state
    from satellite_computervision_tpu.train.keras_import import (
        load_keras_unet_h5,
    )
    from satellite_computervision_tpu.train.trainer import make_train_step

    bands, f0, f1, k = 4, 4, 8, 32
    lr, pos_weight, steps, batch = 9e-4, 2.0, 20, 4

    # -- the reference U-Net in tf.keras (same builder as the forward-
    # parity test: conv_block double-call bug and all) ------------------
    class conv_batch_act(layers.Layer):
        def __init__(self, nf, **kw):
            super().__init__(**kw)
            self.conv_layer = layers.Conv2D(nf, (3, 3), padding="same")
            self.bn_layer = layers.BatchNormalization()
            self.act = layers.Activation("relu")

        def call(self, x, training=None):
            return self.act(self.bn_layer(self.conv_layer(x),
                                          training=training))

    class conv_block(layers.Layer):
        def __init__(self, nf, name="conv_block", **kw):
            super().__init__(name=name, **kw)
            self.cba1 = conv_batch_act(nf)
            self.cba2 = conv_batch_act(nf)

        def call(self, x, training=None):
            y = self.cba1(x, training=training)
            y = self.cba1(x, training=training)  # the reference's bug
            return y

    class encoder_block(layers.Layer):
        def __init__(self, nf, name="encoder_block", **kw):
            super().__init__(name=name, **kw)
            self.encoder = conv_block(nf)
            self.pooler = layers.MaxPooling2D((2, 2), strides=(2, 2))

        def call(self, x, training=None):
            e = self.encoder(x, training=training)
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

    inputs = layers.Input(shape=[None, None, bands])
    p0, e0 = encoder_block(f0, name="encoder_0")(inputs)
    p1, e1 = encoder_block(f1, name="encoder_1")(p0)
    center = conv_block(f1 * 2)(p1)
    d1 = decoder_block(center, e1, f1)
    d0 = decoder_block(d1, e0, f0)
    probs = layers.Conv2D(1, (1, 1), activation="sigmoid", name="logits")(d0)
    m = models.Model(inputs=inputs, outputs=[probs])

    g = np.random.default_rng(7)
    for v in m.weights:
        shape = v.shape.as_list()
        if "moving_variance" in v.name or "gamma" in v.name:
            v.assign(g.uniform(0.5, 1.5, shape).astype(np.float32))
        else:
            v.assign((g.normal(size=shape) * 0.2).astype(np.float32))
    path = str(tmp_path / "init.h5")
    m.save(path)

    # -- identical init on the flax side via the importer ----------------
    model = UNet(n_classes=1, filters=(f0, f1), factors=(2, 2),
                 head="sigmoid", convs_per_block=1)
    x0 = jnp.zeros((1, k, k, bands))
    init = model.init(jax.random.key(0), x0)
    params, stats = load_keras_unet_h5(path, init["params"],
                                       init["batch_stats"])

    # -- identical data ---------------------------------------------------
    rng = np.random.default_rng(11)
    xs = rng.normal(0.3, 0.4, (steps, batch, k, k, bands)).astype(np.float32)
    ys = (rng.uniform(size=(steps, batch, k, k, 1)) > 0.75).astype(np.float32)

    # -- TF training loop (manual tape: no fit() shuffling) ---------------
    opt = tf.keras.optimizers.Adam(learning_rate=lr, epsilon=1e-7)
    tf_losses = []
    for i in range(steps):
        xb, yb = tf.constant(xs[i]), tf.constant(ys[i])
        with tf.GradientTape() as tape:
            pred = m(xb, training=True)
            p = tf.clip_by_value(pred, 1e-5, 1.0 - 1e-5)
            loss = tf.reduce_mean(
                yb * -tf.math.log(p) * pos_weight
                + (1.0 - yb) * -tf.math.log(1.0 - p))
        grads = tape.gradient(loss, m.trainable_variables)
        opt.apply_gradients(zip(grads, m.trainable_variables))
        tf_losses.append(float(loss))

    # -- this framework's Trainer step on the imported init ---------------
    state = create_train_state(
        model, jax.random.key(0), x0,
        tx=optax.adam(lr, eps=1e-7)).replace(params=params,
                                             batch_stats=stats)
    step = make_train_step(
        lambda y, p: losses.weighted_bce(y, p, pos_weight=pos_weight,
                                         logits=False),
        pred_key="probs", donate=False)
    jx_losses = []
    for i in range(steps):
        state, mtr = step(state, (jnp.asarray(xs[i]), jnp.asarray(ys[i])))
        jx_losses.append(float(mtr["loss"]))

    # step-0 losses come from the identical imported weights: tight.
    # later steps accumulate float32 reduction-order drift through conv
    # grads + Adam; the curves must still track point-by-point.
    np.testing.assert_allclose(jx_losses[0], tf_losses[0], rtol=1e-5)
    np.testing.assert_allclose(jx_losses, tf_losses, rtol=2e-2)
    # and the trajectories END in the same place (both optimized)
    assert abs(jx_losses[-1] - tf_losses[-1]) < 2e-2 * abs(tf_losses[0])
    print("tf vs jax losses:",
          [f"{a:.5f}/{b:.5f}" for a, b in zip(tf_losses, jx_losses)])
