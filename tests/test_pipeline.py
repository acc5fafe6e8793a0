"""TFRecord chip pipeline: parse -> fused preprocess -> batches."""

import numpy as np
import pytest

import jax

from satellite_computervision_tpu.data import (
    ChipDataset,
    get_eval_dataset,
    get_training_dataset,
    write_tfrecord_file,
)
from satellite_computervision_tpu.data.pipeline import make_preprocess_fn

BANDS = ["B2", "B3", "B4", "B8"]
K = 16


def _write_chips(path, n=8, seed=0):
    rng = np.random.default_rng(seed)
    examples = []
    for i in range(n):
        ex = {b: rng.uniform(0, 1, K * K).astype(np.float32) for b in BANDS}
        ex["landcover"] = (rng.uniform(size=K * K) > 0.7).astype(np.float32)
        examples.append(ex)
    write_tfrecord_file(str(path), examples)
    return examples


def test_chip_dataset_parses_shapes(tmp_path):
    path = tmp_path / "c.tfrecord"
    examples = _write_chips(path, n=3)
    ds = ChipDataset([str(path)], BANDS + ["landcover"], kernel_size=K)
    out = list(ds)
    assert len(out) == 3
    assert out[0]["B2"].shape == (K, K)
    np.testing.assert_allclose(out[1]["B3"], examples[1]["B3"].reshape(K, K), rtol=1e-6)


def test_preprocess_shapes_and_rescale(tmp_path):
    path = tmp_path / "c.tfrecord"
    _write_chips(path)
    it = iter(get_training_dataset([str(path)], BANDS + ["landcover"], kernel_size=K,
                                   batch_size=4, shuffle_buffer=8))
    raw = next(it)
    pre = make_preprocess_fn(BANDS, "landcover", axes=(0, 1))
    x, y = pre(raw, jax.random.key(0), train=True)
    assert x.shape == (4, K, K, 4)
    assert y.shape == (4, K, K, 1)
    # rescaled to [0, 1]; labels clipped binary
    assert float(x.min()) >= -1e-4 and float(x.max()) <= 1.0 + 1e-4
    assert set(np.unique(np.asarray(y))) <= {0.0, 1.0}


def test_preprocess_no_augment_deterministic(tmp_path):
    path = tmp_path / "c.tfrecord"
    _write_chips(path)
    it = iter(get_eval_dataset([str(path)], BANDS + ["landcover"], kernel_size=K, batch_size=2))
    raw = next(it)
    pre = make_preprocess_fn(BANDS, "landcover", axes=(0, 1), augment=False)
    x1, _ = pre(raw, jax.random.key(0))
    x2, _ = pre(raw, jax.random.key(99))
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_preprocess_one_hot_response(tmp_path):
    rng = np.random.default_rng(0)
    path = tmp_path / "mc.tfrecord"
    examples = []
    for _ in range(4):
        ex = {b: rng.uniform(0, 1, K * K).astype(np.float32) for b in BANDS}
        ex["lc"] = rng.integers(0, 5, K * K).astype(np.float32)
        examples.append(ex)
    write_tfrecord_file(str(path), examples)
    it = iter(get_training_dataset([str(path)], BANDS + ["lc"], kernel_size=K,
                                   batch_size=2, shuffle_buffer=2))
    raw = next(it)
    pre = make_preprocess_fn(BANDS, "lc", axes=(0, 1), response_depth=5, augment=False)
    x, y = pre(raw, jax.random.key(0))
    assert y.shape == (2, K, K, 5)
    np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, rtol=1e-6)


def test_training_iterator_repeats_and_batches(tmp_path):
    path = tmp_path / "c.tfrecord"
    _write_chips(path, n=5)
    ds = get_training_dataset([str(path)], BANDS + ["landcover"], kernel_size=K,
                              batch_size=2, shuffle_buffer=4, repeat=True)
    it = iter(ds)
    for _ in range(6):  # > one epoch (5 examples -> 2 batches/epoch)
        batch = next(it)
        assert batch["B2"].shape == (2, K, K)


def test_parallel_workers_same_examples(tmp_path):
    """Thread-pool decode yields the same multiset of examples."""
    paths = []
    for i in range(3):
        p = tmp_path / f"f{i}.tfrecord"
        _write_chips(p, n=4, seed=i)
        paths.append(str(p))
    serial = list(ChipDataset(paths, BANDS + ["landcover"], kernel_size=K, workers=1))
    parallel = list(ChipDataset(paths, BANDS + ["landcover"], kernel_size=K, workers=3))
    assert len(serial) == len(parallel) == 12
    key = lambda ex: ex["B2"].tobytes()
    assert sorted(map(key, serial)) == sorted(map(key, parallel))


def test_f16_staging_matches_f32(tmp_path):
    """stage_dtype=float16 halves the H2D bytes; the jitted preprocess
    casts back to f32 on device, so outputs match full-precision staging
    to f16 rounding (~1e-3 relative)."""
    path = tmp_path / "c.tfrecord"
    _write_chips(path)
    mk = lambda dt: iter(get_training_dataset(
        [str(path)], BANDS + ["landcover"], kernel_size=K,
        batch_size=4, shuffle_buffer=8, seed=7, stage_dtype=dt))
    raw16, raw32 = next(mk(np.float16)), next(mk(None))
    assert raw16["B2"].dtype == np.float16
    # the CLI passes the dtype as a string ("float16"); same result
    assert next(mk("float16"))["B2"].dtype == np.float16
    pre = make_preprocess_fn(BANDS, "landcover", axes=(0, 1), augment=False)
    x16, y16 = pre(raw16, jax.random.key(0))
    x32, y32 = pre(raw32, jax.random.key(0))
    assert x16.dtype == x32.dtype == np.float32
    np.testing.assert_allclose(np.asarray(x16), np.asarray(x32), atol=2e-3)
    np.testing.assert_array_equal(np.asarray(y16), np.asarray(y32))


def test_unet_remat_forward_matches():
    import jax
    import jax.numpy as jnp

    from satellite_computervision_tpu.models import UNet

    x = jax.random.normal(jax.random.key(0), (1, 16, 16, 3))
    base = UNet(n_classes=1, filters=(4,), factors=(2,), head="sigmoid")
    remat = UNet(n_classes=1, filters=(4,), factors=(2,), head="sigmoid", remat=True)
    v = base.init(jax.random.key(1), x)
    a = base.apply(v, x)["logits"]
    b = remat.apply(v, x)["logits"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_eval_iterator_single_pass(tmp_path):
    path = tmp_path / "c.tfrecord"
    _write_chips(path, n=4)
    ds = get_eval_dataset([str(path)], BANDS + ["landcover"], kernel_size=K, batch_size=1)
    batches = list(iter(ds))
    assert len(batches) == 4
