"""Shape/dtype tests for every model builder (SURVEY.md §4 plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from satellite_computervision_tpu.models import (
    ACNN,
    DeepLabV3Plus,
    HierarchicalACNN,
    HybridUNetLSTM,
    LSTMAutoencoder,
    LSTMModel,
    SiameseUNet,
    UNet,
)

KEY = jax.random.key(0)


def test_unet_multiclass_shapes():
    model = UNet(n_classes=3, filters=(4, 8), factors=(2, 2), head="softmax")
    x = jnp.zeros((2, 32, 32, 6))
    variables = model.init(KEY, x)
    out = model.apply(variables, x)
    assert out["probs"].shape == (2, 32, 32, 3)
    assert out["classes"].shape == (2, 32, 32)
    assert out["classes"].dtype == jnp.int32
    np.testing.assert_allclose(np.asarray(out["probs"].sum(-1)), 1.0, rtol=1e-5)


def test_unet_binary_threshold():
    model = UNet(n_classes=1, filters=(4, 8), factors=(2, 2), head="sigmoid", threshold=0.9)
    x = jnp.zeros((1, 16, 16, 4))
    variables = model.init(KEY, x)
    out = model.apply(variables, x)
    assert out["probs"].shape == (1, 16, 16, 1)
    assert set(np.unique(np.asarray(out["classes"]))) <= {0, 1}


def test_unet_output_bias():
    model = UNet(n_classes=1, filters=(4,), factors=(2,), head="sigmoid", output_bias=-2.0)
    variables = model.init(KEY, jnp.zeros((1, 8, 8, 2)))
    bias = np.asarray(variables["params"]["head"]["bias"])
    np.testing.assert_allclose(bias, -2.0)


def test_unet_space_to_depth_variant():
    model = UNet(n_classes=2, filters=(4, 8), factors=(2, 2), head="softmax",
                 space_to_depth=True)
    x = jnp.zeros((1, 16, 16, 3))
    variables = model.init(KEY, x)
    out = model.apply(variables, x)
    assert out["probs"].shape == (1, 16, 16, 2)
    assert "stem_upsample" in variables["params"]
    with pytest.raises(ValueError):
        bad = UNet(n_classes=1, filters=(4,), factors=(2,), space_to_depth=True)
        bad.init(KEY, jnp.zeros((1, 15, 15, 3)))


def test_unet_train_mode_updates_batch_stats():
    model = UNet(n_classes=1, filters=(4,), factors=(2,), head="sigmoid")
    x = jax.random.normal(KEY, (2, 8, 8, 2))
    variables = model.init(KEY, x)
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    leaf0 = jax.tree_util.tree_leaves(variables["batch_stats"])[0]
    leaf1 = jax.tree_util.tree_leaves(mutated["batch_stats"])[0]
    assert not np.array_equal(np.asarray(leaf0), np.asarray(leaf1))


def test_unet_bfloat16_compute_float32_out():
    model = UNet(n_classes=2, filters=(4,), factors=(2,), dtype=jnp.bfloat16)
    x = jnp.zeros((1, 8, 8, 3))
    variables = model.init(KEY, x)
    out = model.apply(variables, x)
    assert out["logits"].dtype == jnp.float32
    # params stay float32
    k = variables["params"]["head"]["kernel"]
    assert k.dtype == jnp.float32


def test_siamese_unet():
    model = SiameseUNet(filters=(4, 8), factors=(2, 2))
    a = jnp.zeros((2, 16, 16, 4))
    b = jnp.ones((2, 16, 16, 4))
    variables = model.init(KEY, b, a)
    out = model.apply(variables, b, a)
    assert out["probs"].shape == (2, 16, 16, 1)
    # encoder weights shared: exactly one encoder_0 param subtree
    assert "encoder_0" in variables["params"]
    assert "encoder_0_1" not in variables["params"]


def test_lstm_model():
    model = LSTMModel(n_classes=2, features=4)
    x = jnp.zeros((2, 3, 8, 8, 5))
    variables = model.init(KEY, x)
    out = model.apply(variables, x)
    assert out.shape == (2, 8, 8, 2)
    assert float(jnp.max(out)) <= 2.0


def test_lstm_autoencoder():
    model = LSTMAutoencoder(n_classes=3, n_time=4, features=4)
    x = jnp.zeros((1, 4, 8, 8, 3))
    sincos = jnp.zeros((1, 8, 8, 2))
    variables = model.init(KEY, x, sincos)
    out = model.apply(variables, x, sincos)
    assert out["temporal"].shape == (1, 4, 8, 8, 3)
    assert out["single"].shape == (1, 8, 8, 3)


def test_acnn():
    model = ACNN(n_classes=4, n_blocks=3, features=4)
    x = jnp.zeros((1, 16, 16, 5))
    variables = model.init(KEY, x)
    out = model.apply(variables, x)
    assert out["probs"].shape == (1, 16, 16, 4)
    np.testing.assert_allclose(np.asarray(out["probs"].sum(-1)), 1.0, rtol=1e-5)


def test_acnn_variant1_wiring():
    from satellite_computervision_tpu.models.acnn import ACNNTrunk

    trunk = ACNNTrunk(n_blocks=2, features=4, variant=1)
    x = jnp.zeros((1, 8, 8, 3))
    variables = trunk.init(KEY, x)
    taps = trunk.apply(variables, x)
    assert len(taps) == 2 and taps[-1].shape == (1, 8, 8, 4)


def test_hierarchical_acnn():
    model = HierarchicalACNN(
        n_classes=9, acnn_classes=8, sub_classes=4, n_blocks=4, features=4, lstm_features=4
    )
    x = jnp.zeros((1, 12, 12, 5))
    ts = jnp.zeros((1, 3, 6, 6, 4))
    variables = model.init(KEY, x, ts)
    out = model.apply(variables, x, ts)
    assert out["sub_probs"].shape == (1, 12, 12, 4)
    assert out["acnn_probs"].shape == (1, 12, 12, 8)
    assert out["lstm_probs"].shape == (1, 12, 12, 9)


def test_hybrid():
    model = HybridUNetLSTM(n_classes=7, filters=(4, 8), factors=(3, 2), lstm_features=4)
    unet_in = jnp.zeros((1, 24, 24, 4))
    lstm_in = jnp.zeros((1, 3, 8, 8, 6))
    variables = model.init(KEY, unet_in, lstm_in)
    out = model.apply(variables, unet_in, lstm_in)
    assert out["probs"].shape == (1, 24, 24, 7)


@pytest.mark.slow
def test_deeplab():
    model = DeepLabV3Plus(n_classes=1, stage_sizes=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 4))
    variables = model.init(KEY, x)
    out = model.apply(variables, x)
    assert out["probs"].shape == (1, 64, 64, 1)
