"""BN folding (models/fold.py): the served fold_bn=True program must be
numerically identical to eval-mode BN for every UNet variant."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from satellite_computervision_tpu.models import UNet, fold_unet_variables


def _randomized_variables(model, x, rng):
    v = jax.device_get(model.init(jax.random.key(0), x))
    # non-trivial running stats: folding must actually move mean/var/gamma
    v["batch_stats"] = jax.tree_util.tree_map(
        lambda a: np.abs(np.asarray(rng.normal(size=np.shape(a)), np.float32)) + 0.3,
        v["batch_stats"],
    )
    v["params"] = jax.tree_util.tree_map(
        lambda a: np.asarray(rng.normal(size=np.shape(a)) * 0.2, np.float32),
        v["params"],
    )
    return v


@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        {"convs_per_block": 1},
        {"space_to_depth": True},
        {"head": "softmax", "n_classes": 3},
    ],
    ids=["plain", "ref-compat", "s2d", "softmax"],
)
def test_folded_forward_matches_eval_bn(rng, kwargs):
    kwargs = dict(n_classes=1, filters=(4, 8), factors=(2, 2), head="sigmoid") | kwargs
    model = UNet(**kwargs)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    v = _randomized_variables(model, x, rng)

    key = "probs"
    want = np.asarray(model.apply(v, x)[key], np.float32)
    folded_model, folded_v = fold_unet_variables(model, v)
    assert "batch_stats" not in folded_v  # no BN state survives folding
    got = np.asarray(folded_model.apply(folded_v, x)[key], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_engine_from_model_folds_and_matches(rng):
    """TiledInferenceEngine.from_model(fold_bn=True) serves the folded
    program; scene outputs equal the live-BN engine's."""
    from satellite_computervision_tpu.inference import TiledInferenceEngine

    model = UNet(n_classes=1, filters=(4, 8), factors=(2, 2), head="sigmoid")
    x = jnp.zeros((1, 48, 48, 3))
    v = _randomized_variables(model, x, rng)
    scene = rng.normal(size=(96, 96, 3)).astype(np.float32)

    kwargs = dict(kernel=32, buffer=16, batch_size=4, out_channels=1)
    eng_fold = TiledInferenceEngine.from_model(model, v, **kwargs)
    eng_live = TiledInferenceEngine.from_model(model, v, fold_bn=False, **kwargs)
    got = np.asarray(eng_fold.predict_scene(scene))
    want = np.asarray(eng_live.predict_scene(scene))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_folded_model_rejects_training(rng):
    model = UNet(n_classes=1, filters=(4,), factors=(2,), fold_bn=True)
    x = jnp.zeros((1, 8, 8, 2))
    v = UNet(n_classes=1, filters=(4,), factors=(2,)).init(jax.random.key(0), x)
    from satellite_computervision_tpu.models import fold_unet_variables as f

    fm, fv = f(UNet(n_classes=1, filters=(4,), factors=(2,)), jax.device_get(v))
    with pytest.raises(ValueError, match="inference-only"):
        fm.apply(fv, x, train=True, rngs={"dropout": jax.random.key(1)})
