import numpy as np

from satellite_computervision_tpu.ops import (
    generate_chip_indices,
    extract_chips,
    stitch_chips,
)


def _reference_indices(h, w, buff, kernel):
    """Literal transcription of utils/prediction_tools.py:87-109."""
    side = buff + kernel
    half = buff // 2
    ys = list(range(half, h - side, kernel))
    xs = list(range(half, w - side, kernel))
    return [(y, x) for y in ys for x in xs]


def test_reference_index_parity():
    for h, w, k, b in [(1024, 1024, 256, 128), (700, 900, 256, 128), (2048, 1024, 512, 256)]:
        got = generate_chip_indices(h, w, kernel=k, buffer=b, mode="reference")
        want = np.asarray(_reference_indices(h, w, b, k), np.int32).reshape(-1, 2)
        np.testing.assert_array_equal(got, want)


def test_cover_mode_reaches_edges():
    idx = generate_chip_indices(1000, 1000, kernel=256, buffer=128, mode="cover")
    ys = np.unique(idx[:, 0])
    # last chip's central window must end at H - buffer/2
    assert ys[-1] + 256 == 1000 - 64
    assert ys[0] == 64


def test_extract_stitch_roundtrip(rng):
    scene = rng.normal(size=(640, 640, 3)).astype(np.float32)
    k, b = 128, 64
    idx = generate_chip_indices(*scene.shape[:2], kernel=k, buffer=b, mode="cover")
    chips = np.asarray(extract_chips(scene, idx, kernel=k, buffer=b))
    assert chips.shape == (len(idx), k + b, k + b, 3)
    # identity "model": stitched central windows reproduce the scene there
    out = np.asarray(stitch_chips(chips, idx, scene.shape, kernel=k, buffer=b, blend="overwrite"))
    half = b // 2
    lo, hi = half, 640 - half
    np.testing.assert_allclose(out[lo:hi, lo:hi], scene[lo:hi, lo:hi], rtol=1e-6)
    # outside the covered area the template stays zero
    assert np.all(out[:half] == 0)


def test_stitch_hann_constant_field(rng):
    """Blending a constant prediction must return (near) the constant —
    weights normalize out."""
    k, b = 64, 32
    scene_shape = (320, 320, 1)
    idx = generate_chip_indices(*scene_shape[:2], kernel=k, buffer=b, mode="cover")
    chips = np.full((len(idx), k + b, k + b, 1), 3.5, np.float32)
    out = np.asarray(stitch_chips(chips, idx, scene_shape, kernel=k, buffer=b, blend="hann"))
    half = b // 2
    inner = out[half + k // 2 : -half - k // 2, half + k // 2 : -half - k // 2]
    np.testing.assert_allclose(inner, 3.5, rtol=1e-4)


def test_stitch_sum_matches_reference_loop(rng):
    """blend='sum' reproduces the reference predict_chips accumulation
    (utils/prediction_tools.py:133-156) given identical per-chip outputs."""
    k, b = 64, 32
    scene = rng.normal(size=(320, 320, 2)).astype(np.float32)
    idx = generate_chip_indices(*scene.shape[:2], kernel=k, buffer=b, mode="reference")
    chips = np.asarray(extract_chips(scene, idx, kernel=k, buffer=b))
    preds = chips[..., :1] * 2.0  # stand-in "model"
    got = np.asarray(stitch_chips(preds, idx, (320, 320, 1), kernel=k, buffer=b, blend="sum"))

    half = b // 2
    template = np.zeros((320, 320), np.float32)
    for i, (y, x) in enumerate(idx):
        template[y : y + k, x : x + k] += preds[i, half : half + k, half : half + k, 0]
    np.testing.assert_allclose(got[..., 0], template, rtol=1e-5)
