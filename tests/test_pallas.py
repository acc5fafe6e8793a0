"""Pallas kernels in interpreter mode (CPU): semantics vs the op-chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from satellite_computervision_tpu.ops.augment import apply_morph
from satellite_computervision_tpu.pallas import fused_preprocess
from satellite_computervision_tpu.pallas.preprocess import draw_augment_params


def test_no_augment_matches_rescale(rng):
    chips = rng.uniform(10.0, 5000.0, (3, 16, 16, 4)).astype(np.float32)
    out = np.asarray(fused_preprocess(chips, augment=False, interpret=True))
    lo = chips.min(axis=(1, 2), keepdims=True)
    hi = chips.max(axis=(1, 2), keepdims=True)
    np.testing.assert_allclose(out, (chips - lo) / (hi - lo + 1e-8), rtol=1e-4, atol=1e-5)


def test_label_channels_pass_through(rng):
    feats = rng.uniform(0, 100, (2, 8, 8, 3)).astype(np.float32)
    labels = (rng.uniform(size=(2, 8, 8, 1)) > 0.5).astype(np.float32)
    stack = np.concatenate([feats, labels], axis=-1)
    out = np.asarray(fused_preprocess(stack, n_color=3, augment=False, interpret=True))
    np.testing.assert_array_equal(out[..., 3:], labels)
    assert out[..., :3].max() <= 1.0 + 1e-5


def test_fused_matches_unfused_ops_exactly(rng):
    """Bit-compatibility: the kernel with externally drawn params must equal
    recolor -> rescale -> morph built from the ops module with the SAME
    draws."""
    chips = rng.uniform(0.0, 100.0, (4, 8, 8, 3)).astype(np.float32)
    key = jax.random.key(11)
    out = np.asarray(fused_preprocess(chips, key, n_color=3, interpret=True))

    contra, bright, morph = draw_augment_params(key, 4, 3)
    contra, bright, morph = np.asarray(contra), np.asarray(bright), np.asarray(morph)
    for i in range(4):
        x = chips[i]
        mean = x.mean(axis=(0, 1), keepdims=True)
        x = (x - mean) * contra[i] + mean * bright[i]
        lo = x.min(axis=(0, 1), keepdims=True)
        hi = x.max(axis=(0, 1), keepdims=True)
        x = (x - lo) / (hi - lo + 1e-8)
        x = np.asarray(
            apply_morph(x, jnp.asarray(bool(morph[i, 0])), jnp.asarray(bool(morph[i, 1])), jnp.asarray(morph[i, 2]))
        )
        np.testing.assert_allclose(out[i], x, rtol=1e-4, atol=1e-5)


def test_augment_preserves_geometry(rng):
    """Output is one of the 8 dihedral transforms of the unaugmented
    output, identically across channels."""
    chips = rng.uniform(0, 1, (4, 8, 8, 2)).astype(np.float32)
    base = np.asarray(fused_preprocess(chips, n_color=0, augment=False, interpret=True))
    out = np.asarray(
        fused_preprocess(chips, jax.random.key(7), n_color=0, interpret=True)
    )
    for i in range(chips.shape[0]):
        candidates = []
        for fv in (False, True):
            x = np.flip(base[i], 0) if fv else base[i]
            for fh in (False, True):
                y = np.flip(x, 1) if fh else x
                for r in range(4):
                    candidates.append(np.rot90(y, r, axes=(0, 1)))
        assert any(np.allclose(out[i], cand, atol=1e-5) for cand in candidates), i


def test_deterministic_per_key(rng):
    chips = rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
    a = np.asarray(fused_preprocess(chips, jax.random.key(5), interpret=True))
    b = np.asarray(fused_preprocess(chips, jax.random.key(5), interpret=True))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(fused_preprocess(chips, jax.random.key(6), interpret=True))
    assert not np.array_equal(a, c)


def test_augment_requires_key(rng):
    with pytest.raises(ValueError):
        fused_preprocess(np.zeros((1, 8, 8, 2), np.float32), interpret=True)


# ---------------------------------------------------------------- stitch


def _naive_hann_blend(weighted, kernel, rows, cols, side):
    """Direct numpy reference: place each weighted chip at (r*k, c*k),
    accumulate, divide by the (recomputed) weight sum."""
    from satellite_computervision_tpu.pallas.stitch import hann_inverse_weights

    c_out = weighted.shape[-1]
    canvas = np.zeros(((rows + 1) * kernel, (cols + 1) * kernel, c_out), np.float32)
    for r in range(rows):
        for c in range(cols):
            canvas[r * kernel : r * kernel + side,
                   c * kernel : c * kernel + side] += weighted[r * cols + c]
    return canvas * hann_inverse_weights(rows, cols, kernel, side)[..., None]


def test_hann_window_single_source():
    """The engine's 2-D window must be the outer product of the SAME 1-D
    profile the blend normalizer divides out — a fork of the formula
    would silently mis-scale every hann output."""
    from satellite_computervision_tpu.inference.tiles import _hann_window
    from satellite_computervision_tpu.pallas.stitch import hann_window_1d

    for side in (12, 48, 384):
        w1 = hann_window_1d(side)
        np.testing.assert_array_equal(
            np.asarray(_hann_window(side)), w1[:, None] * w1[None, :]
        )


def test_hann_stitch_matches_naive(rng):
    from satellite_computervision_tpu.pallas.stitch import hann_stitch

    k, buf, rows, cols, c_out = 16, 8, 3, 4, 2
    side = k + buf
    weighted = rng.normal(size=(rows * cols, side, side, c_out)).astype(np.float32)
    out = np.asarray(hann_stitch(weighted, k, rows, cols, interpret=True))
    ref = _naive_hann_blend(weighted, k, rows, cols, side)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode,max_rows", [
    ("grid", None),
    ("reference", None),
    ("grid", 48),  # banded streaming builds prepadded band programs
])
def test_engine_pallas_blend_matches_xla(rng, mode, max_rows):
    """The engine with pallas_blend='interpret' must reproduce the XLA
    quadrant-add blend for both index modes and under banded streaming."""
    from satellite_computervision_tpu.inference import TiledInferenceEngine

    scene = rng.normal(size=(70, 90, 3)).astype(np.float32)
    mean_model = lambda chips: chips.mean(axis=-1, keepdims=True)
    kwargs = dict(kernel=16, buffer=8, batch_size=4, out_channels=1,
                  blend="hann", index_mode=mode, max_rows=max_rows)
    xla = TiledInferenceEngine(mean_model, **kwargs)
    pallas = TiledInferenceEngine(mean_model, pallas_blend="interpret", **kwargs)
    a = np.asarray(xla.predict_scene(scene))
    b = np.asarray(pallas.predict_scene(scene))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
