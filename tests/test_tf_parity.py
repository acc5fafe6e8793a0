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
