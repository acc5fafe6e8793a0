import numpy as np
import pytest

from satellite_computervision_tpu.geo import (
    Affine,
    array_bounds,
    convert_poly_coords,
    convert_yolo_bbox,
    geo_to_pixel,
    make_window,
    pixel_to_geo,
    read_geotiff,
    write_cog,
    write_geotiff,
)
from satellite_computervision_tpu.geo.transforms import polygon_centroid


TRANSFORM = (10.0, 0.0, 500000.0, 0.0, -10.0, 4500000.0)  # 10 m UTM-style


def test_geotiff_roundtrip_float(tmp_path, rng):
    img = rng.normal(size=(50, 40, 2)).astype(np.float32)
    path = str(tmp_path / "pred.tif")
    write_geotiff(path, img, transform=TRANSFORM, crs="EPSG:32617", nodata=255)
    back, meta = read_geotiff(path)
    np.testing.assert_array_equal(back, img)
    assert meta["transform"] == TRANSFORM
    assert "32617" in meta["crs"]
    assert meta["nodata"] == 255.0


def test_geotiff_uncompressed_uint8(tmp_path, rng):
    img = rng.integers(0, 255, (33, 21), np.uint8)
    path = str(tmp_path / "x.tif")
    write_geotiff(path, img, compress=False)
    back, _ = read_geotiff(path)
    np.testing.assert_array_equal(back[..., 0], img)


def test_cog_tiled_with_overviews(tmp_path, rng):
    img = rng.normal(size=(300, 280, 1)).astype(np.float32)
    path = str(tmp_path / "c.tif")
    write_cog(path, img, transform=TRANSFORM, crs="EPSG:32617", tile_size=128)
    base, meta = read_geotiff(path, page=0)
    np.testing.assert_array_equal(base, img)
    over, over_meta = read_geotiff(path, page=1)
    assert over.shape[0] == 150
    # overview pixel scale doubles
    assert over_meta["transform"][0] == 20.0
    np.testing.assert_allclose(
        over[0, 0, 0], img[:2, :2, 0].mean(), rtol=1e-5
    )


def test_pil_reads_our_tiff(tmp_path, rng):
    """Cross-codec validation: PIL (an independent TIFF implementation)
    must decode our writer's output."""
    from PIL import Image

    img = rng.integers(0, 255, (40, 30), np.uint8)
    path = str(tmp_path / "plain.tif")
    write_geotiff(path, img, compress=False)
    with Image.open(path) as im:
        np.testing.assert_array_equal(np.asarray(im), img)

    imgf = rng.normal(size=(25, 20)).astype(np.float32)
    pathf = str(tmp_path / "float.tif")
    write_geotiff(pathf, imgf, compress=True)  # deflate
    with Image.open(pathf) as im:
        np.testing.assert_allclose(np.asarray(im), imgf, rtol=1e-6)


def test_affine_inverse_roundtrip():
    t = Affine(10.0, 0.5, 100.0, -0.2, -10.0, 2000.0)
    x, y = t(13, 27)
    col, row = t.inverse()(x, y)
    np.testing.assert_allclose([col, row], [13, 27], atol=1e-9)


def test_pixel_geo_roundtrip():
    cols = np.array([0, 10, 256])
    rows = np.array([0, 5, 256])
    xs, ys = pixel_to_geo(TRANSFORM, cols, rows)
    c2, r2 = geo_to_pixel(TRANSFORM, xs, ys)
    np.testing.assert_allclose(c2, cols, atol=1e-9)
    np.testing.assert_allclose(r2, rows, atol=1e-9)


def test_convert_poly_coords_inverse():
    poly = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    geo = convert_poly_coords(poly, TRANSFORM)
    back = convert_poly_coords(geo, TRANSFORM, inverse=True)
    np.testing.assert_allclose(back, poly, atol=1e-9)


def test_yolo_bbox():
    x, y, w, h = convert_yolo_bbox((10, 30, 20, 60), (100, 200))
    assert (x, y, w, h) == (0.2, 0.2, 0.2, 0.2)


def test_array_bounds():
    left, bottom, right, top = array_bounds(100, 200, TRANSFORM)
    assert left == 500000.0 and top == 4500000.0
    assert right == 500000.0 + 200 * 10
    assert bottom == 4500000.0 - 100 * 10


def test_polygon_centroid_square():
    sq = [[0, 0], [2, 0], [2, 2], [0, 2]]
    np.testing.assert_allclose(polygon_centroid(sq), (1.0, 1.0))


def test_make_window():
    assert make_window(100, 60, 50) == (75, 35, 50, 50)


def test_geotiff_scene_windowed_reads(tmp_path, rng):
    """GeoTiffScene decodes only the strips/tiles a window touches and
    matches the full read bit-for-bit on both layouts (striped writer,
    tiled COG writer)."""
    from satellite_computervision_tpu.geo import GeoTiffScene, write_cog

    arr = rng.uniform(0, 2000, (300, 270, 4)).astype(np.float32)
    for name, writer in [("striped", write_geotiff), ("cog", write_cog)]:
        path = str(tmp_path / f"{name}.tif")
        writer(path, arr, transform=(10, 0, 5, 0, -10, 7),
               crs="EPSG:32617", nodata=0.0)
        sc = GeoTiffScene(path)
        assert sc.shape == arr.shape and sc.dtype == np.float32
        assert sc.nodata == 0.0 and "32617" in sc.meta["crs"]
        np.testing.assert_array_equal(np.asarray(sc), arr)
        for rs, cs in [
            (slice(0, 7), slice(None)),
            (slice(100, 262), slice(33, 257)),
            (slice(-12, None), slice(None, -200)),
        ]:
            np.testing.assert_array_equal(sc[rs, cs], arr[rs, cs])
        np.testing.assert_array_equal(sc[5:20, 8:40, 1:3], arr[5:20, 8:40, 1:3])
        with pytest.raises(IndexError):
            sc[::2]
        with pytest.raises(IndexError):
            sc[5]


def test_stream_writer_matches_bulk_writer(tmp_path, rng):
    """GeoTiffStreamWriter fed arbitrary row blocks reads back identical
    (values AND metadata) to a bulk write_geotiff of the same array, on
    both compressed and raw layouts and 2-D blocks."""
    from satellite_computervision_tpu.geo import GeoTiffStreamWriter, GeoTiffScene

    for compress, c in [(True, 3), (False, 1)]:
        arr = rng.uniform(0, 1000, (137, 53, c)).astype(np.float32)
        path = str(tmp_path / f"stream_{compress}.tif")
        with GeoTiffStreamWriter(
            path, 137, 53, c, np.float32, transform=TRANSFORM,
            crs="EPSG:32617", nodata=-1.0, compress=compress,
        ) as wr:
            y = 0
            for n in (1, 40, 7, 64, 25):  # uneven blocks spanning strips
                block = arr[y : y + n]
                wr.write_rows(block[..., 0] if c == 1 else block)
                y += n
        back, meta = read_geotiff(path)
        np.testing.assert_array_equal(back, arr)
        assert meta["transform"] == TRANSFORM
        assert "32617" in meta["crs"] and meta["nodata"] == -1.0
        # windowed reads work on the trailing-IFD layout too
        sc = GeoTiffScene(path)
        np.testing.assert_array_equal(sc[30:90, 10:50], arr[30:90, 10:50])


def test_stream_writer_contract_errors(tmp_path):
    """Row accounting is strict: overflow, dtype drift, and short closes
    raise instead of writing a silently-corrupt raster."""
    from satellite_computervision_tpu.geo import GeoTiffStreamWriter

    wr = GeoTiffStreamWriter(str(tmp_path / "a.tif"), 10, 4, 1, np.uint8)
    wr.write_rows(np.zeros((6, 4, 1), np.uint8))
    with pytest.raises(ValueError, match="overflow"):
        wr.write_rows(np.zeros((5, 4, 1), np.uint8))
    with pytest.raises(ValueError, match="dtype"):
        wr.write_rows(np.zeros((1, 4, 1), np.float32))
    with pytest.raises(ValueError, match="shape"):
        wr.write_rows(np.zeros((1, 5, 1), np.uint8))
    with pytest.raises(ValueError, match="expected 10"):
        wr.close()
    with pytest.raises(ValueError, match="closed"):
        wr.write_rows(np.zeros((1, 4, 1), np.uint8))
    with pytest.raises(ValueError):
        GeoTiffStreamWriter(str(tmp_path / "b.tif"), 5, 4, 1, np.bool_)


def test_stream_writer_overflow_guard(tmp_path):
    """Classic TIFF carries 32-bit offsets: an uncompressed raster that
    cannot fit must fail at construction, not after hours of streaming."""
    from satellite_computervision_tpu.geo import GeoTiffStreamWriter

    with pytest.raises(ValueError, match="4 GiB"):
        GeoTiffStreamWriter(str(tmp_path / "big.tif"), 40000, 40000, 3,
                            np.float32, compress=False)
    # compressed construction is allowed (size unknowable upfront)
    wr = GeoTiffStreamWriter(str(tmp_path / "big2.tif"), 40000, 40000, 3,
                             np.float32, compress=True)
    wr.abort()


def test_stream_writer_abort(tmp_path):
    """abort() leaves an unfinalized (invalid) file and further writes
    fail; the context manager aborts on error instead of finalizing."""
    from satellite_computervision_tpu.geo import GeoTiffScene, GeoTiffStreamWriter

    path = str(tmp_path / "a.tif")
    with pytest.raises(RuntimeError, match="boom"):
        with GeoTiffStreamWriter(path, 10, 4, 1, np.uint8) as wr:
            wr.write_rows(np.zeros((6, 4, 1), np.uint8))
            raise RuntimeError("boom")
    with pytest.raises(Exception):
        GeoTiffScene(path)  # header points at IFD offset 0 — not a TIFF


def test_cog_stream_writer_matches_bulk_cog(tmp_path, rng):
    """GeoTiffCogStreamWriter fed row blocks produces pages with the same
    values as the in-memory write_cog: identical base raster, identical
    mean-pooled overview pixels, same per-level transform scaling — while
    never holding more than O(tile_size x W) rows."""
    from satellite_computervision_tpu.geo import GeoTiffCogStreamWriter

    img = rng.normal(size=(300, 280, 2)).astype(np.float32)
    bulk = str(tmp_path / "bulk.tif")
    write_cog(bulk, img, transform=TRANSFORM, crs="EPSG:32617",
              tile_size=128, nodata=0.0)
    streamed = str(tmp_path / "streamed.tif")
    with GeoTiffCogStreamWriter(streamed, 300, 280, 2, np.float32,
                                transform=TRANSFORM, crs="EPSG:32617",
                                nodata=0.0, tile_size=128) as wr:
        y = 0
        for n in (1, 99, 64, 100, 36):  # uneven blocks spanning tile bands
            wr.write_rows(img[y : y + n])
            y += n
    page = 0
    while True:
        try:
            got, gmeta = read_geotiff(streamed, page=page)
        except IndexError:
            break
        want, wmeta = read_geotiff(bulk, page=page)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
        assert gmeta["transform"] == wmeta["transform"]
        assert gmeta["nodata"] == 0.0
        page += 1
    assert page >= 3  # base + at least two overview levels

    # windowed reads work on the streamed layout
    from satellite_computervision_tpu.geo import GeoTiffScene

    sc = GeoTiffScene(streamed)
    np.testing.assert_array_equal(sc[40:200, 33:257], img[40:200, 33:257])


def test_cog_stream_writer_int_decimation(tmp_path, rng):
    """Integer overviews decimate (write_cog's rule), and uncompressed
    streamed COGs decode with PIL (independent TIFF implementation)."""
    from satellite_computervision_tpu.geo import GeoTiffCogStreamWriter

    img = rng.integers(0, 255, (90, 70, 1), np.uint8)
    path = str(tmp_path / "u8.tif")
    with GeoTiffCogStreamWriter(path, 90, 70, 1, np.uint8, tile_size=32,
                                compress=False, overview_levels=1) as wr:
        wr.write_rows(img)
    base, _ = read_geotiff(path, page=0)
    np.testing.assert_array_equal(base, img)
    over, _ = read_geotiff(path, page=1)
    np.testing.assert_array_equal(over, img[:90 // 2 * 2:2, :70 // 2 * 2:2])

    from PIL import Image

    with Image.open(path) as im:
        np.testing.assert_array_equal(np.asarray(im), img[..., 0])


def test_cog_stream_writer_contract(tmp_path):
    from satellite_computervision_tpu.geo import GeoTiffCogStreamWriter, GeoTiffScene

    wr = GeoTiffCogStreamWriter(str(tmp_path / "a.tif"), 10, 4, 1, np.uint8)
    wr.write_rows(np.zeros((6, 4, 1), np.uint8))
    with pytest.raises(ValueError, match="overflow"):
        wr.write_rows(np.zeros((5, 4, 1), np.uint8))
    with pytest.raises(ValueError, match="expected 10"):
        wr.close()
    with pytest.raises(ValueError, match="multiples of 16"):
        GeoTiffCogStreamWriter(str(tmp_path / "b.tif"), 10, 4, 1, np.uint8,
                               tile_size=100)
    path = str(tmp_path / "c.tif")
    with pytest.raises(RuntimeError):
        with GeoTiffCogStreamWriter(path, 10, 4, 1, np.uint8) as wr2:
            raise RuntimeError("x")
    with pytest.raises(Exception):
        GeoTiffScene(path)  # aborted -> unfinalized
