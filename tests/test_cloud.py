"""Cloud-layer math: masking scores, calibration, matching, blob IO."""

import numpy as np
import pytest

from satellite_computervision_tpu.cloud import calibration, masking
from satellite_computervision_tpu.cloud.blob import load_numpy, save_numpy
from satellite_computervision_tpu.data import get_file_id, match_files, split_files


def test_basic_qa_mask():
    qa = np.array([[0, 1024], [2048, 3072]], np.int32)
    got = np.asarray(masking.basic_qa_mask(qa))
    np.testing.assert_array_equal(got, [[True, False], [False, False]])


def test_landsat8_mask():
    qa = np.array([0, 8, 32, 40], np.int32)
    np.testing.assert_array_equal(
        np.asarray(masking.landsat8_sr_mask(qa)), [True, False, False, False]
    )


def test_scl_mask():
    scl = np.array([1, 2, 3, 4, 8, 9, 10, 11, 5], np.int32)
    want = [True, False, False, True, False, False, False, False, True]
    np.testing.assert_array_equal(np.asarray(masking.scl_mask(scl)), want)


def test_cloud_score_bright_vs_dark():
    shape = (4, 4)
    bright = {b: np.full(shape, 6000.0, np.float32) for b in masking.TOA_BANDS}
    dark = {b: np.full(shape, 300.0, np.float32) for b in masking.TOA_BANDS}
    # make dark truly cloud-free: dry + snow-free indicators
    dark["B11"] = np.full(shape, 2000.0, np.float32)
    s_bright = np.asarray(masking.sentinel_cloud_score(bright))
    s_dark = np.asarray(masking.sentinel_cloud_score(dark))
    assert s_bright.mean() > s_dark.mean()
    assert s_bright.dtype == np.uint8


def test_water_score_wet_vs_dry():
    shape = (4, 4)
    water = {b: np.full(shape, 200.0, np.float32) for b in masking.TOA_BANDS}
    water["B2"] = np.full(shape, 1500.0, np.float32)  # water: relatively bright blue
    water["B3"] = np.full(shape, 3000.0, np.float32)  # green high, SWIR low -> ndsi high
    water["B11"] = np.full(shape, 100.0, np.float32)
    water["B12"] = np.full(shape, 100.0, np.float32)
    water["B8"] = np.full(shape, 150.0, np.float32)
    land = {b: np.full(shape, 3000.0, np.float32) for b in masking.TOA_BANDS}
    assert np.asarray(masking.water_score(water)).mean() > np.asarray(
        masking.water_score(land)
    ).mean()


def test_apply_mask_nan_fill():
    bands = {"B2": np.ones((2, 2), np.float32)}
    mask = np.array([[True, False], [False, True]])
    out = np.asarray(masking.apply_mask(bands, mask)["B2"])
    assert np.isnan(out[0, 1]) and out[0, 0] == 1.0


def test_norm_p_monotone():
    z = np.array([-2.0, 0.0, 2.0], np.float32)
    p = np.asarray(masking.norm_p(z))
    assert p[0] > p[1] > p[2]  # right-tail style score decreases in z
    np.testing.assert_allclose(p[1], 0.5, atol=1e-6)


def test_chi_p_known_value():
    # chi2 CDF at x=df -> ~0.5-0.6 region; check monotonicity + a point
    from scipy.stats import chi2

    got = float(masking.chi_p(3.0, 2))
    np.testing.assert_allclose(got, chi2.cdf(3.0, 2), rtol=1e-5)


def test_clamp_and_scale():
    img = np.arange(100, dtype=np.float32).reshape(10, 10, 1)
    out = calibration.clamp_and_scale(img, (10, 90))
    assert out.min() == 0.0 and out.max() == 1.0
    assert (out[:, :, 0][img[:, :, 0] <= 9.9] == 0).all()


def test_match_histogram_matches_distribution(rng):
    src = rng.normal(100, 10, (64, 64)).astype(np.float32)
    tpl = rng.normal(200, 30, (64, 64)).astype(np.float32)
    out = calibration.match_histogram(src, tpl)
    assert abs(out.mean() - tpl.mean()) < 6.0
    assert abs(out.std() - tpl.std()) < 6.0


def test_equalize_collection_chains(rng):
    a = rng.normal(100, 10, (32, 32, 2)).astype(np.float32)
    b = rng.normal(150, 20, (32, 32, 2)).astype(np.float32)
    c = rng.normal(50, 5, (32, 32, 2)).astype(np.float32)
    out = calibration.equalize_collection([a, b, c])
    assert len(out) == 3
    np.testing.assert_array_equal(out[0], a)
    assert abs(out[1].mean() - a.mean()) < 8.0
    assert abs(out[2].mean() - out[1].mean()) < 10.0


def test_make_FC_per_band_cdfs(rng):
    img = rng.normal(100, 10, (32, 32, 3)).astype(np.float32)
    fc = calibration.make_FC(img, n_bins=64)
    assert len(fc) == 3
    for centers, cdf in fc:
        assert centers.shape == cdf.shape == (64,)
        assert np.all(np.diff(cdf) >= 0) and abs(cdf[-1] - 1.0) < 1e-9
    # AOI-masked FC only sees overlap pixels
    mask = np.zeros((32, 32), bool)
    mask[:8] = True
    fc_aoi = calibration.make_FC(img + 500 * (~mask[..., None]), mask, n_bins=64)
    assert fc_aoi[0][0].max() < 200  # the +500 region is outside the AOI


def test_equalize_rf_vs_cdf_interp_ab(rng):
    """A/B: the exact CDF-interp equalize vs the reference's chained-RF
    form (utils/calibration.py:136-182) on realistic S2-like histograms
    — bimodal reflectance DNs with a gain/offset shift between scenes.
    The deviation between the two is the RF's approximation error of the
    same DN->cdf->DN map; the exact form must match the template's
    distribution at least as well. Measured numbers recorded in
    PARITY.md's calibration row."""
    # bimodal (vegetation + soil modes) template; source = template under
    # a radiometric gain/offset + its own sampling noise
    modes = rng.choice([0, 1], 4096, p=[0.6, 0.4])
    tpl = np.where(modes == 0, rng.normal(1200, 150, 4096),
                   rng.normal(2600, 300, 4096)).astype(np.float32)
    src = (tpl * 1.18 + 140 + rng.normal(0, 60, 4096)).astype(np.float32)
    src, tpl = src.reshape(64, 64, 1), tpl.reshape(64, 64, 1)

    exact = calibration.equalize_scene(src, tpl, n_bins=256)
    rf = calibration.equalize_rf(src, tpl, n_bins=256, n_trees=25, seed=1)

    # both land near the template's distribution; quantify the deviation
    dev = float(np.abs(exact - rf).mean())
    spread = float(tpl.max() - tpl.min())
    assert dev / spread < 0.05, f"RF deviates {dev:.1f} DN from exact"

    # the exact form is at least as good a distribution match (per-decile
    # quantile error vs the template)
    qs = np.linspace(5, 95, 19)

    def qerr(x):
        return float(np.abs(np.percentile(x, qs) - np.percentile(tpl, qs)).mean())

    assert qerr(exact) <= qerr(rf) + 1e-6, (qerr(exact), qerr(rf))


def test_scene_median_nan_aware():
    img = np.array([[[1.0], [np.nan]], [[3.0], [5.0]]], np.float32)
    np.testing.assert_allclose(calibration.scene_median(img), [3.0])


def test_blob_numpy_roundtrip(tmp_path, rng):
    arr = rng.normal(size=(4, 4)).astype(np.float32)
    path = str(tmp_path / "sub" / "x.npy")
    save_numpy(arr, path)
    np.testing.assert_array_equal(load_numpy(path), arr)


def test_file_matching(tmp_path):
    urls = [
        "/data/naip/chip_md_2021_007_x.npy",
        "/data/naip/chip_md_2021_008_x.npy",
        "/data/label/chip_md_2021_007_x.npy",
        "/data/label/chip_md_2021_009_x.npy",
    ]
    out = match_files(urls, {"naip": {"files": []}, "label": {"files": []}})
    assert out["naip"]["files"] == ["/data/naip/chip_md_2021_007_x.npy"]
    assert out["label"]["files"] == ["/data/label/chip_md_2021_007_x.npy"]
    assert get_file_id("chip_md_2021_007_x.npy") == ("007", "x")


def test_split_files():
    files = [
        "/d/naip/a_b_c_1_2.npy",
        "/d/label/a_b_c_1_2.npy",
        "/d/naip/a_b_c_9_9.npy",
    ]
    naip, label = split_files(files, labels=["naip", "label"])
    assert naip == ["/d/naip/a_b_c_1_2.npy"]
    assert label == ["/d/label/a_b_c_1_2.npy"]


def test_resign_vrt_rewrites_tokens(tmp_path):
    """resign_vrt (utils/pc_tools.py:55-81) without GDAL: http sources get
    fresh tokens via the signer, nested/warped VRTs re-sign recursively."""
    from satellite_computervision_tpu.cloud.pc import resign_vrt

    inner = tmp_path / "warped_part.vrt"
    inner.write_text(
        "<VRTDataset><SourceDataset>"
        "https://example.blob.core.windows.net/naip/a.tif?sig=OLD"
        "</SourceDataset></VRTDataset>"
    )
    outer = tmp_path / "mosaic.vrt"
    outer.write_text(
        "<VRTDataset><VRTRasterBand>"
        "<SimpleSource><SourceFilename>"
        "https://example.blob.core.windows.net/naip/b.tif?sig=OLD"
        "</SourceFilename></SimpleSource>"
        f"<SimpleSource><SourceFilename>{inner.name}</SourceFilename></SimpleSource>"
        "</VRTRasterBand></VRTDataset>"
    )

    signer = lambda url: url + "?sig=NEW"
    out = resign_vrt(str(outer), signer=signer)
    text = open(out).read()
    assert "b.tif?sig=NEW" in text and "sig=OLD" not in text
    assert "warped_part_resigned.vrt" in text
    inner_out = tmp_path / "warped_part_resigned.vrt"
    assert "a.tif?sig=NEW" in inner_out.read_text()
