"""Self-contained CRS transforms (geo/crs.py) — the reprojection branch of
get_img_bounds (reference utils/prediction_tools.py:584-597)."""

import math

import numpy as np
import pytest

from satellite_computervision_tpu.geo import crs


def test_utm_roundtrip_subcentimeter():
    lons = np.linspace(-84, -78, 9)  # zone 17 (lon0 = -81)
    lats = np.linspace(0.5, 70, 9)
    lo, la = np.meshgrid(lons, lats)
    x, y = crs.lonlat_to_utm(lo, la, 32617)
    lo2, la2 = crs.utm_to_lonlat(x, y, 32617)
    assert np.abs(lo2 - lo).max() < 1e-9
    assert np.abs(la2 - la).max() < 1e-9


def test_utm_central_meridian_exact():
    # on the central meridian, easting is exactly 500 km and northing is
    # k0 * meridian arc length (checked against the exact ellipsoidal
    # integral at build time; anchor value for 45N below)
    x, y = crs.lonlat_to_utm(-81.0, 45.0, 32617)
    assert x == pytest.approx(500000.0, abs=1e-6)
    assert y == pytest.approx(4982950.4002, abs=1e-3)


def test_utm_south_false_northing():
    x, y = crs.lonlat_to_utm(151.0, -33.9, 32756)
    assert 0 < y < 10000000.0
    lo, la = crs.utm_to_lonlat(x, y, 32756)
    assert la == pytest.approx(-33.9, abs=1e-9)
    assert lo == pytest.approx(151.0, abs=1e-9)


def test_webmercator_roundtrip():
    lon, lat = crs.webmercator_to_lonlat(*crs.lonlat_to_webmercator(-75.2, 40.1))
    assert lon == pytest.approx(-75.2, abs=1e-9)
    assert lat == pytest.approx(40.1, abs=1e-9)


def test_transform_points_identity_and_chain():
    xs, ys = crs.transform_points([1.0], [2.0], "EPSG:4326", 4326)
    assert xs[0] == 1.0 and ys[0] == 2.0
    # UTM -> web mercator -> UTM chain
    mx, my = crs.transform_points([500000.0], [3873043.06], 32617, 3857)
    bx, by = crs.transform_points(mx, my, 3857, 32617)
    assert bx[0] == pytest.approx(500000.0, abs=1e-3)
    assert by[0] == pytest.approx(3873043.06, abs=1e-3)


def test_transform_bounds_contains_corners():
    left, bottom, right, top = 500000.0, 3870000.0, 530000.0, 3900000.0
    l2, b2, r2, t2 = crs.transform_bounds(left, bottom, right, top, 32617, 4326)
    # every corner maps inside the densified bounds
    for x, y in [(left, bottom), (right, top), (left, top), (right, bottom)]:
        lon, lat = crs.utm_to_lonlat(x, y, 32617)
        assert l2 - 1e-9 <= lon <= r2 + 1e-9
        assert b2 - 1e-9 <= lat <= t2 + 1e-9


def test_parse_epsg_rejects_garbage():
    with pytest.raises(ValueError):
        crs.parse_epsg("utm zone 17")
    with pytest.raises(ValueError):
        crs._utm_zone(4326)


def test_get_img_bounds_reprojects():
    from satellite_computervision_tpu.inference.batch import get_img_bounds
    from satellite_computervision_tpu.inference.mixer import MixerInfo

    mixer = MixerInfo(
        total_patches=6, patches_per_row=3, patch_dimensions=(16, 16),
        affine=(10.0, 0.0, 500000.0, 0.0, -10.0, 3900000.0), crs="EPSG:32617",
    )
    raw = get_img_bounds((32, 48), mixer)
    assert raw == [[3900000.0 - 320.0, 500000.0], [3900000.0, 500000.0 + 480.0]]

    (south, west), (north, east) = get_img_bounds((32, 48), mixer, dst_crs="EPSG:4326")
    assert -82 < west < east < -80   # zone 17 longitudes
    assert 35 < south < north < 36   # ~3.9e6 m northing
