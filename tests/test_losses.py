import numpy as np
import pytest

from satellite_computervision_tpu.models import losses


def test_weighted_bce_prob_form():
    y_true = np.array([1.0, 0.0], np.float32)
    y_pred = np.array([0.8, 0.3], np.float32)
    got = float(losses.weighted_bce(y_true, y_pred, pos_weight=2.0))
    want = np.mean([2.0 * -np.log(0.8), -np.log(0.7)])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_weighted_bce_logits_matches_prob_form():
    rng = np.random.default_rng(0)
    logits = rng.normal(0, 2, (64,)).astype(np.float32)
    y = (rng.uniform(size=(64,)) > 0.5).astype(np.float32)
    probs = 1.0 / (1.0 + np.exp(-logits))
    a = float(losses.weighted_bce(y, logits, pos_weight=3.0, logits=True))
    b = float(losses.weighted_bce(y, probs, pos_weight=3.0, logits=False))
    np.testing.assert_allclose(a, b, rtol=1e-3)


def test_weighted_bce_prob_clipping():
    got = float(losses.weighted_bce(np.array([1.0]), np.array([0.0]), pos_weight=1.0))
    np.testing.assert_allclose(got, -np.log(1e-5), rtol=1e-4)


def test_iou_loss_perfect_and_disjoint():
    t = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    assert float(losses.iou_loss(t, t)) == pytest.approx(0.0, abs=1e-6)
    assert float(losses.iou_loss(t, 1.0 - t)) == pytest.approx(1.0, abs=1e-6)


def test_gen_dice_perfect_prediction():
    rng = np.random.default_rng(1)
    labels = rng.integers(0, 3, (2, 8, 8))
    onehot = np.eye(3, dtype=np.float32)[labels]
    loss = float(losses.gen_dice(onehot, onehot))
    assert loss == pytest.approx(0.0, abs=1e-4)


def test_gen_dice_weights_small_classes_matter():
    """A mistake on a 1-pixel class must cost more than on a large class."""
    labels = np.zeros((1, 8, 8), np.int64)
    labels[0, 0, 0] = 1
    onehot = np.eye(2, dtype=np.float32)[labels]
    miss_small = onehot.copy()
    miss_small[0, 0, 0] = [1.0, 0.0]  # predict background on the rare pixel
    miss_large = onehot.copy()
    miss_large[0, 5, 5] = [0.0, 1.0]  # predict rare class on one bg pixel
    small_cost = float(losses.gen_dice(onehot, miss_small))
    large_cost = float(losses.gen_dice(onehot, miss_large))
    assert small_cost > large_cost


def test_gen_dice_ref_compat_binary_equals_plain_dice():
    """ref_compat=True reproduces the shipped axis=-1 reduction
    (model_tools.py:79-83): for C == 1 the per-pixel weight sum factors
    out of numerator and denominator, so it equals unweighted dice."""
    rng = np.random.default_rng(3)
    y_true = (rng.uniform(size=(2, 8, 8, 1)) > 0.7).astype(np.float32)
    y_pred = rng.uniform(size=(2, 8, 8, 1)).astype(np.float32)
    got = float(losses.gen_dice(y_true, y_pred, ref_compat=True))
    t = y_true.reshape(2, -1)
    p = y_pred.reshape(2, -1)
    plain = np.mean(1.0 - 2.0 * (t * p).sum(1) / (t + p).sum(1))
    assert got == pytest.approx(plain, rel=1e-5)


def test_gen_dice_ref_compat_multiclass_raises_like_reference():
    """For C > 1 the shipped batchwise branch is a (B, H*W) x (B, C)
    broadcast error in TF; ref_compat reproduces the failure instead of
    silently computing something else."""
    labels = np.zeros((1, 4, 4), np.int64)
    onehot = np.eye(3, dtype=np.float32)[labels]
    with pytest.raises(Exception):
        losses.gen_dice(onehot, onehot, ref_compat=True)


def test_gen_dice_batch_counts_pools_over_batch():
    """batch_counts=True uses Sudre et al.'s whole-batch class counts:
    equivalent to global_weights computed from the pooled batch, and —
    the stability property that motivates it — a class with one pixel in
    one batch element but many in another no longer gets the per-element
    1/count^2 = 1.0 weight explosion."""
    rng = np.random.default_rng(5)
    labels = rng.integers(0, 3, (4, 8, 8))
    onehot = np.eye(3, dtype=np.float32)[labels]
    pred = rng.dirichlet(np.ones(3), size=(4, 8, 8)).astype(np.float32)

    counts = onehot.reshape(-1, 3).sum(0)
    want = float(losses.gen_dice(onehot, pred,
                                 global_weights=1.0 / counts**2))
    got = float(losses.gen_dice(onehot, pred, batch_counts=True))
    assert got == pytest.approx(want, rel=1e-5)

    # stability: element 0 has exactly ONE pixel of class 1; per-element
    # weighting gives it weight 1.0 (vs ~2.5e-4 for background) and a
    # miss there dominates the whole loss, while batch pooling prices it
    # by the class's true batch frequency — >10x smaller here
    labels = np.zeros((2, 8, 8), np.int64)
    labels[0, 0, 0] = 1
    labels[1, :4] = 1  # plenty of class-1 pixels in the other element
    onehot = np.eye(2, dtype=np.float32)[labels]
    miss = onehot.copy()
    miss[0, 0, 0] = [1.0, 0.0]
    per_element = float(losses.gen_dice(onehot, miss, batch_counts=False))
    pooled = float(losses.gen_dice(onehot, miss, batch_counts=True))
    assert per_element > 10 * pooled


def test_gen_dice_default_is_batch_pooled():
    """Round-5 default flip: gen_dice() with no flags IS the stable
    whole-batch Sudre pooling (the per-element 1/count^2 form measured to
    collapse training is opt-in via batch_counts=False)."""
    rng = np.random.default_rng(7)
    labels = rng.integers(0, 3, (4, 8, 8))
    labels[0] = 0
    labels[0, 0, 0] = 1  # a 1-pixel class in element 0
    onehot = np.eye(3, dtype=np.float32)[labels]
    pred = rng.dirichlet(np.ones(3), size=(4, 8, 8)).astype(np.float32)
    default = float(losses.gen_dice(onehot, pred))
    pooled = float(losses.gen_dice(onehot, pred, batch_counts=True))
    per_element = float(losses.gen_dice(onehot, pred, batch_counts=False))
    assert default == pytest.approx(pooled, rel=1e-6)
    assert default != pytest.approx(per_element, rel=1e-3)


def test_gen_dice_perfect_prediction_batch_counts():
    rng = np.random.default_rng(1)
    labels = rng.integers(0, 3, (2, 8, 8))
    onehot = np.eye(3, dtype=np.float32)[labels]
    loss = float(losses.gen_dice(onehot, onehot, batch_counts=True))
    assert loss == pytest.approx(0.0, abs=1e-4)


def test_gen_dice_global_weights():
    labels = np.zeros((1, 4, 4), np.int64)
    onehot = np.eye(2, dtype=np.float32)[labels]
    loss = float(losses.gen_dice(onehot, onehot, global_weights=[1.0, 1.0]))
    assert loss == pytest.approx(0.0, abs=1e-5)


def test_weighted_categorical_crossentropy():
    t = np.array([[[[0.0, 1.0]]]], np.float32)
    p = np.array([[[[0.2, 0.8]]]], np.float32)
    got = np.asarray(losses.weighted_categorical_crossentropy(t, p, [1.0, 2.0]))
    # rtol 1e-3: XLA CPU lowers log() to a vectorized approximation
    np.testing.assert_allclose(got, [[[2.0 * -np.log(0.8)]]], rtol=1e-3)


def test_masked_mse_ignores_nonfinite():
    t = np.array([[1.0, np.nan], [2.0, np.inf]], np.float32).reshape(1, 2, 2, 1)
    p = np.array([[2.0, 5.0], [4.0, 5.0]], np.float32).reshape(1, 2, 2, 1)
    got = float(losses.masked_mse(t, p))
    np.testing.assert_allclose(got, (1.0 + 4.0) / 2.0, rtol=1e-6)


def test_masked_mse_gradient_finite_under_nan_targets():
    """The NaN-in-where gradient trap: masking AFTER the subtraction
    leaks d/d_pred of 0 * NaN = NaN into every masked pixel's gradient,
    silently NaN-ing all parameters on the first train step (TF's
    boolean_mask gather never had this; the JAX port must mask the
    target before subtracting). Guards the gradient-safe formulation."""
    import jax

    t = np.array([[1.0, np.nan], [2.0, np.nan]], np.float32).reshape(1, 2, 2, 1)
    p = np.array([[2.0, 5.0], [4.0, 5.0]], np.float32).reshape(1, 2, 2, 1)
    g = np.asarray(jax.grad(lambda p: losses.masked_mse(t, p))(p))
    assert np.isfinite(g).all()
    # masked pixels contribute zero gradient; finite ones the usual 2e/n
    np.testing.assert_allclose(
        g.ravel(), [2 * 1.0 / 2, 0.0, 2 * 2.0 / 2, 0.0], rtol=1e-6)


def test_make_loss_factory():
    fn = losses.make_loss("weighted_bce", pos_weight=2.0)
    assert float(fn(np.array([1.0]), np.array([0.9]))) > 0
    with pytest.raises(KeyError):
        losses.make_loss("nope")
