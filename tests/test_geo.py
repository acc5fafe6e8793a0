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
    """Classic TIFF carries 32-bit offsets: an oversize raster auto-
    upgrades to BigTIFF, and a FORCED-classic uncompressed raster that
    cannot fit fails at construction, not after hours of streaming."""
    from satellite_computervision_tpu.geo import GeoTiffStreamWriter

    with pytest.raises(ValueError, match="bigtiff=True"):
        GeoTiffStreamWriter(str(tmp_path / "big.tif"), 40000, 40000, 3,
                            np.float32, compress=False, bigtiff=False)
    # forced classic + compressed construction is allowed (size unknowable
    # upfront; the first overflowing strip raises instead)
    wr = GeoTiffStreamWriter(str(tmp_path / "big2.tif"), 40000, 40000, 3,
                             np.float32, compress=True, bigtiff=False)
    wr.abort()
    # default (auto) silently upgrades to 64-bit offsets
    wr = GeoTiffStreamWriter(str(tmp_path / "big3.tif"), 40000, 40000, 3,
                             np.float32, compress=False)
    assert wr._big
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


# ---------------------------------------------------------------------------
# BigTIFF (64-bit offsets)
# ---------------------------------------------------------------------------


def _is_bigtiff(path):
    with open(path, "rb") as f:
        return f.read(4) == b"II+\x00"


def test_bigtiff_roundtrip_and_pil(tmp_path, rng):
    """bigtiff=True writes version-43 files our reader AND PIL decode to
    the same pixels/meta as the classic layout."""
    from PIL import Image

    img = rng.normal(size=(50, 40, 2)).astype(np.float32)
    path = str(tmp_path / "big.tif")
    write_geotiff(path, img, transform=TRANSFORM, crs="EPSG:32617",
                  nodata=255, bigtiff=True)
    assert _is_bigtiff(path)
    back, meta = read_geotiff(path)
    np.testing.assert_array_equal(back, img)
    assert meta["transform"] == TRANSFORM
    assert "32617" in meta["crs"]
    assert meta["nodata"] == 255.0

    # single-band uncompressed -> PIL cross-decode
    u8 = rng.integers(0, 255, (33, 21), np.uint8)
    p2 = str(tmp_path / "big_u8.tif")
    write_geotiff(p2, u8, compress=False, bigtiff=True)
    assert _is_bigtiff(p2)
    with Image.open(p2) as im:
        np.testing.assert_array_equal(np.asarray(im), u8)


def test_bigtiff_cog_matches_classic(tmp_path, rng):
    """write_cog(bigtiff=True) pages equal the classic pages exactly."""
    img = rng.normal(size=(300, 280, 1)).astype(np.float32)
    classic = str(tmp_path / "classic.tif")
    big = str(tmp_path / "big.tif")
    write_cog(classic, img, transform=TRANSFORM, crs="EPSG:32617",
              tile_size=128)
    write_cog(big, img, transform=TRANSFORM, crs="EPSG:32617",
              tile_size=128, bigtiff=True)
    assert not _is_bigtiff(classic) and _is_bigtiff(big)
    page = 0
    while True:
        try:
            want, wmeta = read_geotiff(classic, page=page)
        except IndexError:
            with pytest.raises(IndexError):
                read_geotiff(big, page=page)
            break
        got, gmeta = read_geotiff(big, page=page)
        np.testing.assert_array_equal(got, want)
        assert gmeta == wmeta
        page += 1
    assert page >= 2


def test_bigtiff_stream_writers(tmp_path, rng):
    """Both stream writers honor bigtiff=True; windowed reads work."""
    from satellite_computervision_tpu.geo import (
        GeoTiffCogStreamWriter,
        GeoTiffScene,
        GeoTiffStreamWriter,
    )

    img = rng.normal(size=(130, 90, 2)).astype(np.float32)
    p_strip = str(tmp_path / "strip.tif")
    with GeoTiffStreamWriter(p_strip, 130, 90, 2, np.float32,
                             transform=TRANSFORM, crs="EPSG:32617",
                             bigtiff=True) as wr:
        wr.write_rows(img[:77])
        wr.write_rows(img[77:])
    assert _is_bigtiff(p_strip)
    back, meta = read_geotiff(p_strip)
    np.testing.assert_array_equal(back, img)
    assert meta["transform"] == TRANSFORM

    p_cog = str(tmp_path / "cog.tif")
    with GeoTiffCogStreamWriter(p_cog, 130, 90, 2, np.float32,
                                transform=TRANSFORM, crs="EPSG:32617",
                                tile_size=64, bigtiff=True) as wr:
        wr.write_rows(img)
    assert _is_bigtiff(p_cog)
    base, _ = read_geotiff(p_cog, page=0)
    np.testing.assert_array_equal(base, img)
    over, ometa = read_geotiff(p_cog, page=1)
    assert over.shape == (65, 45, 2)
    assert ometa["transform"][0] == 20.0
    sc = GeoTiffScene(p_cog)
    np.testing.assert_array_equal(sc[10:100, 5:70], img[10:100, 5:70])


def test_bigtiff_auto_switch(tmp_path, rng, monkeypatch):
    """bigtiff=None auto-enables 64-bit offsets when the raster estimate
    exceeds the classic limit; forced bigtiff=False raises at overflow
    with a message pointing at bigtiff=True."""
    from satellite_computervision_tpu.geo import GeoTiffStreamWriter
    from satellite_computervision_tpu.geo import geotiff as gt

    img = rng.normal(size=(64, 48, 1)).astype(np.float32)
    # shrink the "4 GiB" limit so a tiny raster crosses it
    monkeypatch.setattr(gt, "_CLASSIC_LIMIT", (1 << 20) + 1024)
    auto = str(tmp_path / "auto.tif")
    write_geotiff(auto, img, transform=TRANSFORM)
    assert _is_bigtiff(auto)
    back, _ = read_geotiff(auto)
    np.testing.assert_array_equal(back, img)

    with pytest.raises(ValueError, match="bigtiff=True"):
        with GeoTiffStreamWriter(str(tmp_path / "f.tif"), 64, 48, 1,
                                 np.float32, compress=False,
                                 bigtiff=False) as wr:
            monkeypatch.setattr(gt, "_CLASSIC_LIMIT", 1024)
            wr.write_rows(img)


# ---------------------------------------------------------------------------
# External encodings (LZW / PackBits / predictors) — files we never write
# but real COG assets carry; cross-validated against libtiff via PIL.
# ---------------------------------------------------------------------------


def _libtiff():
    from PIL import features

    return features.check("libtiff")


@pytest.mark.skipif(not _libtiff(), reason="PIL lacks libtiff")
def test_read_libtiff_lzw_packbits_predictor(tmp_path):
    """Decode libtiff-written LZW, PackBits, LZW+predictor-2 (uint8 and
    uint16) and DEFLATE+predictor-3 (float32) files bit-exactly."""
    from PIL import Image

    u8 = (np.arange(40 * 30, dtype=np.uint8) % 251).reshape(40, 30)
    cases = [
        ("lzw.tif", u8, {"compression": "tiff_lzw"}),
        ("pb.tif", u8, {"compression": "packbits"}),
        ("lzw_p2.tif", u8, {"compression": "tiff_lzw", "tiffinfo": {317: 2}}),
    ]
    for name, arr, kw in cases:
        p = str(tmp_path / name)
        Image.fromarray(arr).save(p, **kw)
        back, _ = read_geotiff(p)
        np.testing.assert_array_equal(back[..., 0], arr)

    u16 = (np.arange(31 * 22, dtype=np.uint32) * 523 % 60001).astype(np.uint16)
    u16 = u16.reshape(31, 22)
    p = str(tmp_path / "u16_p2.tif")
    im = Image.new("I;16", (22, 31))
    im.frombytes(u16.tobytes())
    im.save(p, compression="tiff_lzw", tiffinfo={317: 2})
    back, _ = read_geotiff(p)
    np.testing.assert_array_equal(back[..., 0], u16)

    f32 = (np.linspace(0.0, 37.5, 25 * 17).reshape(25, 17).astype(np.float32))
    p = str(tmp_path / "f_p3.tif")
    Image.fromarray(f32).save(p, compression="tiff_adobe_deflate",
                              tiffinfo={317: 3})
    back, _ = read_geotiff(p)
    np.testing.assert_array_equal(back[..., 0], f32)


@pytest.mark.skipif(not _libtiff(), reason="PIL lacks libtiff")
def test_scene_windowed_reads_lzw(tmp_path):
    """GeoTiffScene windowed reads decode only the strips a window
    touches — exercise that path on an LZW+predictor file."""
    from PIL import Image

    from satellite_computervision_tpu.geo import GeoTiffScene

    arr = (np.arange(120 * 40, dtype=np.uint16) * 7919 % 50021).astype(
        np.uint16).reshape(120, 40)
    p = str(tmp_path / "win.tif")
    im = Image.new("I;16", (40, 120))
    im.frombytes(arr.tobytes())
    im.save(p, compression="tiff_lzw", tiffinfo={317: 2, 278: 16})
    sc = GeoTiffScene(p)
    assert sc.shape == (120, 40, 1)
    np.testing.assert_array_equal(sc[13:97, 5:33][..., 0], arr[13:97, 5:33])
    np.testing.assert_array_equal(np.asarray(sc)[..., 0], arr)


def test_undo_predictor_multiband_and_errors(rng):
    """_undo_predictor inverts hand-forward-transformed chunks: per-band
    horizontal differencing with modulo wraparound (predictor 2, incl.
    signed ints) and byte-plane float differencing (predictor 3)."""
    from satellite_computervision_tpu.geo.geotiff import _undo_predictor

    # predictor 2, 3-band int16 with values that wrap when differenced
    a = rng.integers(-30000, 30000, (9, 14, 3)).astype(np.int16)
    u = a.view(np.uint16)
    diff = u.copy()
    diff[:, 1:] = (u[:, 1:].astype(np.int64) - u[:, :-1]) % 65536
    raw = diff.astype(np.uint16).tobytes()
    out = _undo_predictor(raw, 2, np.dtype(np.int16), 9, 14, 3)
    np.testing.assert_array_equal(out, a)

    # predictor 3, 2-band float32: byte-plane split + byte differencing at
    # stride = samples-per-pixel (libtiff tif_predict.c fpDiff: cp[stride]
    # -= cp[0] over the flat planar row, so channel byte lanes difference
    # independently)
    f = rng.normal(size=(5, 11, 2)).astype(np.float32)
    be = f.astype(">f4").view(np.uint8).reshape(5, 11 * 2, 4)
    planes = be.transpose(0, 2, 1).reshape(5, 4 * 11, 2).astype(np.int16)
    d = planes.copy()
    d[:, 1:] = (planes[:, 1:] - planes[:, :-1]) % 256
    raw = d.astype(np.uint8).tobytes()
    out = _undo_predictor(raw, 3, np.dtype(np.float32), 5, 11, 2)
    np.testing.assert_array_equal(out, f)

    with pytest.raises(ValueError, match="predictor 2"):
        _undo_predictor(b"\x00" * 16, 2, np.dtype(np.float32), 1, 4, 1)
    with pytest.raises(ValueError, match="predictor 3"):
        _undo_predictor(b"\x00" * 4, 3, np.dtype(np.uint8), 1, 4, 1)
    with pytest.raises(ValueError, match="unsupported TIFF predictor"):
        _undo_predictor(b"\x00" * 4, 4, np.dtype(np.uint8), 1, 4, 1)


def test_reader_skips_rational_and_undefined_tags(tmp_path):
    """Real-world producers attach tags the codec never writes (PIL dpi →
    RATIONAL X/YResolution; JPEGTables-style UNDEFINED payloads). The
    parser must decode RATIONALs as floats and skip types it cannot
    interpret instead of crashing (TIFF 6.0 readers' rule)."""
    from PIL import Image

    from satellite_computervision_tpu.geo import GeoTiffScene
    from satellite_computervision_tpu.geo.geotiff import _parse_page_tags

    arr = (np.arange(20 * 16, dtype=np.uint8) % 251).reshape(20, 16)
    p_rat = str(tmp_path / "rational.tif")
    Image.fromarray(arr).save(p_rat, dpi=(300, 300))
    p_und = str(tmp_path / "undef.tif")
    Image.fromarray(arr).save(p_und, tiffinfo={347: b"\x01\x02\x03"})
    for p in (p_rat, p_und):
        np.testing.assert_array_equal(np.asarray(GeoTiffScene(p))[..., 0],
                                      arr)
    with open(p_rat, "rb") as f:
        tags = _parse_page_tags(f)
    assert tags[282] == [300.0]  # XResolution RATIONAL decoded as float


def test_auto_bigtiff_counts_chunk_arrays():
    """The auto heuristic must include the IFD's strip offset/byte-count
    arrays (~8 B per strip classic): an uncompressed raster whose pixel
    payload alone fits classic but whose payload + offset arrays does
    not must select BigTIFF, or close() would die in struct.pack after
    the whole stream was written."""
    from satellite_computervision_tpu.geo.geotiff import _auto_bigtiff

    # width 8192 x uint8 → 1-row strips → n_chunks = height; height
    # 524,000 puts the payload (4,292,608,000 B) under the classic
    # threshold but payload + 16 B/chunk over it.
    assert not 524000 * 8192 > 0xFFFF0000 - (1 << 20)  # payload alone fits
    assert _auto_bigtiff(524000, 8192, 1, 1)
    # far from the boundary, both directions stay stable
    assert not _auto_bigtiff(1000, 8192, 1, 1)
    assert _auto_bigtiff(600000, 8192, 1, 1)


def test_cog_overview_transform_doubles_shear(tmp_path, rng):
    """Overview affines compose the base transform with diag(2, 2):
    shear terms double along with the scales (level k = base · 2^k for
    all four linear terms), in both the bulk and streaming COG writers."""
    from satellite_computervision_tpu.geo import (
        GeoTiffCogStreamWriter,
        write_cog,
    )

    sheared = (10.0, 3.0, 500000.0, 2.0, -10.0, 4500000.0)
    img = rng.normal(size=(600, 500, 1)).astype(np.float32)
    p_bulk = str(tmp_path / "bulk.tif")
    write_cog(p_bulk, img, transform=sheared, crs="EPSG:32617")
    p_stream = str(tmp_path / "stream.tif")
    with GeoTiffCogStreamWriter(p_stream, 600, 500, 1, np.float32,
                                transform=sheared, crs="EPSG:32617") as wr:
        for y in range(0, 600, 100):
            wr.write_rows(img[y : y + 100])
    for p in (p_bulk, p_stream):
        _, meta0 = read_geotiff(p, page=0)
        _, meta1 = read_geotiff(p, page=1)
        assert meta0["transform"] == sheared
        a, b, tx, d, e, ty = sheared
        assert meta1["transform"] == (2 * a, 2 * b, tx, 2 * d, 2 * e, ty)


def test_stream_writer_close_failure_aborts(tmp_path, rng, monkeypatch):
    """A failure while finalizing aborts the writer: the handle closes,
    the header still points at 0 (invalid TIFF — honest), and a retried
    close() is a no-op instead of resuming a half-built IFD chain."""
    from satellite_computervision_tpu.geo import (
        GeoTiffCogStreamWriter,
        GeoTiffStreamWriter,
    )

    img = rng.normal(size=(40, 32, 1)).astype(np.float32)
    for cls in (GeoTiffStreamWriter, GeoTiffCogStreamWriter):
        p = str(tmp_path / f"{cls.__name__}.tif")
        wr = cls(p, 40, 32, 1, np.float32)
        wr.write_rows(img)
        monkeypatch.setattr(wr, "_finalize",
                            lambda: (_ for _ in ()).throw(OSError("disk")),
                            raising=True)
        with pytest.raises(OSError, match="disk"):
            wr.close()
        assert wr._closed and wr._f.closed
        wr.close()  # no-op, must not raise or write
        with open(p, "rb") as f:
            head = f.read(8)
        assert head[4:8] == b"\x00\x00\x00\x00"  # IFD pointer never patched


@pytest.mark.parametrize("compress,predictor,dtype", [
    ("lzw", 1, np.uint16),
    ("lzw", 2, np.uint16),
    ("deflate", 2, np.uint16),
    ("lzw", 3, np.float32),
    ("deflate", 3, np.float32),
])
def test_write_lzw_predictor_roundtrip(tmp_path, rng, compress, predictor,
                                       dtype):
    """Round-5 write-side LZW + predictors: every compress/predictor combo
    round-trips bit-exactly through write_geotiff, write_cog and the
    streaming writers, and windowed reads decode only what they touch."""
    from satellite_computervision_tpu.geo import (
        GeoTiffCogStreamWriter,
        GeoTiffScene,
        GeoTiffStreamWriter,
    )

    low = rng.integers(0, 3000, (9, 9, 3)).astype(np.uint16)
    img = np.kron(low, np.ones((16, 16, 1), np.uint16))[:130, :135]
    img = (img + rng.integers(0, 5, img.shape).astype(np.uint16))
    img = img.astype(dtype) if dtype != np.float32 else (
        img / 3000.0).astype(np.float32)
    kw = dict(transform=TRANSFORM, crs="EPSG:32617",
              compress=compress, predictor=predictor)

    p = str(tmp_path / "w.tif")
    write_geotiff(p, img, **kw)
    back, meta = read_geotiff(p)
    np.testing.assert_array_equal(back, img)
    assert "32617" in meta["crs"]

    p = str(tmp_path / "c.tif")
    write_cog(p, img, tile_size=64, **kw)
    np.testing.assert_array_equal(read_geotiff(p)[0], img)
    sc = GeoTiffScene(p)
    np.testing.assert_array_equal(sc[17:101, 30:99], img[17:101, 30:99])

    p = str(tmp_path / "s.tif")
    with GeoTiffStreamWriter(p, *img.shape, img.dtype, **kw) as wr:
        for y in range(0, img.shape[0], 48):
            wr.write_rows(img[y : y + 48])
    np.testing.assert_array_equal(read_geotiff(p)[0], img)

    p = str(tmp_path / "cs.tif")
    with GeoTiffCogStreamWriter(p, *img.shape, img.dtype, tile_size=64,
                                **kw) as wr:
        for y in range(0, img.shape[0], 48):
            wr.write_rows(img[y : y + 48])
    np.testing.assert_array_equal(read_geotiff(p)[0], img)
    ov, _ = read_geotiff(p, page=1)
    assert ov.shape == (65, 67, 3)


def test_write_predictor_dtype_validation(tmp_path, rng):
    img_f = rng.normal(size=(20, 20, 1)).astype(np.float32)
    img_i = rng.integers(0, 100, (20, 20, 1)).astype(np.uint16)
    with pytest.raises(ValueError, match="predictor 2"):
        write_geotiff(str(tmp_path / "x.tif"), img_f, predictor=2)
    with pytest.raises(ValueError, match="predictor 3"):
        write_geotiff(str(tmp_path / "x.tif"), img_i, predictor=3)
    with pytest.raises(ValueError, match="compression"):
        write_geotiff(str(tmp_path / "x.tif"), img_i, compress="jpeg")


@pytest.mark.skipif(not _libtiff(), reason="PIL lacks libtiff")
def test_libtiff_reads_our_lzw(tmp_path, rng):
    """External cross-validation of the WRITE side: libtiff (via PIL)
    decodes our LZW and LZW+predictor-2 output bit-exactly — the inverse
    direction of test_read_libtiff_lzw_packbits_predictor."""
    from PIL import Image

    u8 = (np.arange(60 * 45, dtype=np.uint8) % 249).reshape(60, 45)
    for predictor in (1, 2):
        p = str(tmp_path / f"ours_p{predictor}.tif")
        write_geotiff(p, u8[..., None], compress="lzw", predictor=predictor)
        back = np.asarray(Image.open(p))
        np.testing.assert_array_equal(back, u8)


def test_norm_compress_codes_and_lzw_bigtiff_estimate():
    """Review regressions: integer TIFF codes pass through _norm_compress
    verbatim (hash(1)==hash(True) would otherwise turn code 1 into
    DEFLATE), and the auto-BigTIFF estimate accounts for LZW's worst-case
    ~1.5x expansion on incompressible data."""
    from satellite_computervision_tpu.geo.geotiff import (
        _auto_bigtiff,
        _auto_expand,
        _norm_compress,
    )

    assert _norm_compress(1) == 1
    assert _norm_compress(5) == 5
    assert _norm_compress(8) == 8
    assert _norm_compress(True) == 8 and _norm_compress(False) == 1
    with pytest.raises(ValueError):
        _norm_compress(7)

    # ~3.2 GiB raw: safe as classic under DEFLATE, not under LZW
    assert not _auto_bigtiff(20000, 20000, 4, 2, expand=_auto_expand(8))
    assert _auto_bigtiff(20000, 20000, 4, 2, expand=_auto_expand(5))


def test_codec_property_fuzz_roundtrip(tmp_path):
    """Seeded property fuzz over the writable codec matrix: random dtype x
    compression x predictor x shape x layout (striped/tiled/bigtiff)
    combinations must round-trip bit-exactly, including windowed reads."""
    from satellite_computervision_tpu.geo.geotiff import GeoTiffScene

    rng = np.random.default_rng(42)
    dtypes = [np.uint8, np.uint16, np.int16, np.int32, np.float32,
              np.float64]
    for trial in range(24):
        dtype = np.dtype(dtypes[int(rng.integers(len(dtypes)))])
        comp = ["none", "deflate", "lzw"][int(rng.integers(3))]
        if dtype.kind == "f":
            predictor = [1, 3][int(rng.integers(2))]
        else:
            predictor = [1, 2][int(rng.integers(2))]
        if comp == "none":
            predictor = 1
        h = int(rng.integers(2, 90))
        w = int(rng.integers(2, 90))
        c = int(rng.integers(1, 5))
        if dtype.kind == "f":
            img = rng.normal(size=(h, w, c)).astype(dtype)
        else:
            info = np.iinfo(dtype)
            img = rng.integers(info.min, info.max, (h, w, c),
                               dtype=np.int64).astype(dtype)
        tiled = bool(rng.integers(2))
        big = bool(rng.integers(2))
        p = str(tmp_path / f"fuzz_{trial}.tif")
        kw = dict(compress=comp, predictor=predictor, bigtiff=big)
        if tiled:
            write_cog(p, img, tile_size=32, overview_levels=0, **kw)
        else:
            write_geotiff(p, img, **kw)
        back, _ = read_geotiff(p)
        label = f"trial {trial}: {dtype} {comp} p{predictor} {h}x{w}x{c}"
        np.testing.assert_array_equal(back, img, err_msg=label)
        if h > 4 and w > 4:
            sc = GeoTiffScene(p)
            r0, c0 = int(rng.integers(h - 2)), int(rng.integers(w - 2))
            np.testing.assert_array_equal(
                sc[r0 : r0 + 2, c0 : c0 + 2], img[r0 : r0 + 2, c0 : c0 + 2],
                err_msg=label + " window")
