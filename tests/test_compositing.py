"""Array-level PC compositing core (cloud/compositing.py) — the stackstac/
run_local/naip_mosaic semantics (utils/pc_tools.py:131-186, :264-386,
:620-668) on plain arrays, ending in the tiled-inference engine."""

import numpy as np
import pytest

from satellite_computervision_tpu.cloud import compositing as cp


def _item(date, bands):
    return {"datetime": date, "bands": bands}


def test_stack_items_nodata_and_harmonize(rng):
    h = w = 8
    pre = _item("2021-06-01", {"B02": np.full((h, w), 1500.0), "B08": np.full((h, w), 2500.0)})
    post = _item("2022-06-01", {"B02": np.full((h, w), 2500.0), "B08": np.full((h, w), 3500.0)})
    post["bands"]["B02"][0, 0] = 0.0  # nodata
    stack = cp.stack_items([pre, post], ["B02", "B08"])
    assert stack.shape == (2, h, w, 2)
    # pre-cutoff untouched
    assert stack[0, 0, 1, 0] == 1500.0
    # post-cutoff: +1000 offset removed
    assert stack[1, 0, 1, 0] == 1500.0 and stack[1, 0, 1, 1] == 2500.0
    # nodata -> NaN (before harmonization could clip it)
    assert np.isnan(stack[1, 0, 0, 0])


def test_median_composite_nan_aware():
    h = w = 4
    t0 = np.full((h, w, 1), 10.0)
    t1 = np.full((h, w, 1), 20.0)
    t2 = np.full((h, w, 1), 30.0)
    t1[0, 0, 0] = np.nan  # cloud-masked pixel: median of remaining two
    stack = np.stack([t0, t1, t2])
    med = cp.median_composite(stack)
    assert med[1, 1, 0] == 20.0
    assert med[0, 0, 0] == 20.0  # nanmedian(10, 30)
    stack[:, 2, 2, 0] = np.nan
    assert np.isnan(cp.median_composite(stack)[2, 2, 0])


def test_normalize_composite_per_pixel_across_bands(rng):
    x = rng.normal(size=(6, 6, 4)).astype(np.float32) * 3 + 5
    out = cp.normalize_composite(x)
    np.testing.assert_allclose(out.mean(axis=-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std(axis=-1), 1.0, atol=1e-3)


def test_change_pair_composite_shape_and_fill(rng):
    h = w = 16
    def items(n, base, date):
        out = []
        for i in range(n):
            bands = {
                b: (base + 100.0 * i + rng.uniform(0, 50, (h, w))).astype(np.float32)
                for b in ("B02", "B03", "B04", "B08")
            }
            out.append(_item(date, bands))
        return out

    scene = cp.change_pair_composite(items(3, 2000, "2021-06-01"),
                                     items(2, 2400, "2021-09-01"))
    assert scene.shape == (h, w, 8)
    assert np.isfinite(scene).all()


def test_mosaic_majority_crs_and_placement():
    px = (1.0, 0.0, 100.0, 0.0, -1.0, 200.0)  # origin (100, 200), 1 m
    a = np.full((4, 4, 2), 1.0, np.float32)
    b = np.full((4, 4, 2), 2.0, np.float32)
    tiles = [
        {"array": a, "transform": px, "crs": "EPSG:32617"},
        {"array": b, "transform": (1.0, 0.0, 104.0, 0.0, -1.0, 198.0), "crs": "EPSG:32617"},
    ]
    mosaic, transform, crs = cp.mosaic_tiles(tiles)
    assert crs == "EPSG:32617"
    assert transform == (1.0, 0.0, 100.0, 0.0, -1.0, 200.0)
    assert mosaic.shape == (6, 8, 2)
    assert mosaic[0, 0, 0] == 1.0
    # tile b starts 4 px right, 2 px down
    assert mosaic[2, 4, 0] == 2.0
    # uncovered corner is NaN
    assert np.isnan(mosaic[5, 0, 0])
    # later tile wins on overlap
    overlap = [
        {"array": a, "transform": px, "crs": "EPSG:32617"},
        {"array": b, "transform": (1.0, 0.0, 102.0, 0.0, -1.0, 200.0), "crs": "EPSG:32617"},
    ]
    m2, _, _ = cp.mosaic_tiles(overlap)
    assert m2[0, 2, 0] == 2.0


def test_mosaic_rejects_unwarped_minority():
    t = (1.0, 0.0, 0.0, 0.0, -1.0, 0.0)
    tiles = [
        {"array": np.zeros((2, 2)), "transform": t, "crs": "EPSG:32617"},
        {"array": np.zeros((2, 2)), "transform": t, "crs": "EPSG:32617"},
        {"array": np.zeros((2, 2)), "transform": t, "crs": "EPSG:32618"},
    ]
    with pytest.raises(ValueError, match="majority CRS"):
        cp.mosaic_tiles(tiles)


def test_mosaic_rejects_misaligned_grid():
    tiles = [
        {"array": np.zeros((2, 2)), "transform": (1.0, 0.0, 0.0, 0.0, -1.0, 0.0), "crs": "a"},
        {"array": np.zeros((2, 2)), "transform": (1.0, 0.0, 0.5, 0.0, -1.0, 0.0), "crs": "a"},
    ]
    with pytest.raises(ValueError, match="grid-aligned"):
        cp.mosaic_tiles(tiles)


def test_composite_feeds_predict_scene(rng):
    """End-to-end: synthetic multi-item STAC fixture -> composite ->
    cloud.pc.predict_scene (the run_local replacement) with no cloud deps."""
    from satellite_computervision_tpu.cloud.pc import predict_scene

    h = w = 96
    items = []
    for i, date in enumerate(["2021-05-01", "2021-06-01", "2022-03-01"]):
        bands = {
            b: (2000.0 + 200 * i + rng.uniform(0, 100, (h, w))).astype(np.float32)
            for b in ("B02", "B03", "B04", "B08")
        }
        bands["B02"][:4, :4] = 0.0  # nodata patch on every item
        items.append(_item(date, bands))
    scene = cp.composite_items(items, ["B02", "B03", "B04", "B08"],
                               normalize=True, fill=0.0)
    assert scene.shape == (h, w, 4) and np.isfinite(scene).all()

    pred = np.asarray(
        predict_scene(scene, lambda c: c.mean(-1, keepdims=True), kernel=32,
                      buffer=16, batch_size=4)
    )
    assert pred.shape == (h, w, 1)
    assert np.isfinite(pred).all()

    # engine options pass through; whole-scene fast path single-device
    pred_w = np.asarray(
        predict_scene(scene, lambda c: c.mean(-1, keepdims=True), kernel=32,
                      buffer=16, tile_mode="whole", whole_multiple=8)
    )
    np.testing.assert_allclose(pred_w, scene.mean(-1, keepdims=True),
                               rtol=1e-5, atol=1e-6)

    # whole mode under a mesh is a guided error, not an opaque shard failure
    import jax
    from satellite_computervision_tpu.parallel import make_mesh

    mesh = make_mesh([("data", 8)], devices=jax.devices())
    with pytest.raises(ValueError, match="whole-band"):
        predict_scene(scene, lambda c: c.mean(-1, keepdims=True), kernel=32,
                      buffer=16, mesh=mesh, tile_mode="whole")
