"""GeoTIFF ingest/egress round-trips (pure-stdlib TIFF path — the
reference's loadGDAL/saveGDAL gap, common/Array2D.hpp:418-431)."""

import numpy as np
import pytest

from richdem_spark.gtiff import parse_geotiff, read_geotiff, write_geotiff
from richdem_spark.tiles import raster_from_array


@pytest.mark.parametrize("dtype,nodata", [
    ("float64", -9999.0),
    ("float32", None),
    ("int32", -1.0),
    ("uint16", None),
])
def test_roundtrip_strips(spark, tmp_path, dtype, nodata):
    rng = np.random.default_rng(3)
    arr = (rng.random((37, 29)) * 100).astype(dtype)
    gt = (421568.0, 3.0, 0.0, 4872699.0, 0.0, -3.0)
    tr = raster_from_array(spark, arr, tile_w=16, tile_h=16,
                           nodata=nodata, geotransform=gt)
    p = str(tmp_path / "t.tif")
    write_geotiff(tr, p, compress=True, rows_per_strip=10)

    info = parse_geotiff(p)
    assert (info["width"], info["height"]) == (29, 37)
    assert info["dtype"] == dtype
    assert info["nodata"] == nodata
    assert info["geotransform"][0] == 421568.0
    assert info["geotransform"][1] == 3.0

    back = read_geotiff(spark, p, tile_w=8, tile_h=8)
    assert back.meta.nodata == nodata
    np.testing.assert_array_equal(back.to_array(), arr)


def test_roundtrip_tiled_layout(spark, tmp_path):
    rng = np.random.default_rng(8)
    arr = (rng.random((45, 51)) * 50).astype("float32")
    tr = raster_from_array(spark, arr, tile_w=16, tile_h=16)
    p = str(tmp_path / "tiled.tif")
    write_geotiff(tr, p, compress=True, tiled=16)
    info = parse_geotiff(p)
    # 4x4 TIFF tiles of 16px covering 51x45
    assert len(info["segments"]) == 12
    back = read_geotiff(spark, p, tile_w=20, tile_h=10)
    np.testing.assert_array_equal(back.to_array(), arr)


def test_uncompressed_and_fill_pipeline(spark, tmp_path):
    """Ingest a golden reference DEM written as GeoTIFF and run the fill
    pipeline on it — end-to-end parity with the ASCII ingest path."""
    from richdem_spark.api import FillDepressions
    from richdem_spark.kernels.ascii_io import read_ascii_grid

    dem, meta = read_ascii_grid(
        "/root/reference/tests/depressions/testdem1.dem")
    golden, _ = read_ascii_grid(
        "/root/reference/tests/depressions/testdem1.all.out")
    nd = meta["nodata_value"]
    tr = raster_from_array(spark, dem, tile_w=4, tile_h=4, nodata=nd)
    p = str(tmp_path / "dem.tif")
    write_geotiff(tr, p, compress=False, rows_per_strip=3)
    back = read_geotiff(spark, p, tile_w=4, tile_h=4)
    np.testing.assert_array_equal(back.to_array(), dem)
    filled = FillDepressions(back).to_array()
    np.testing.assert_array_equal(filled, golden)


def test_unsupported_layouts_raise(tmp_path):
    p = str(tmp_path / "bad.tif")
    with open(p, "wb") as f:
        f.write(b"II\x2b\x00" + b"\x00" * 12)   # BigTIFF magic 43
    with pytest.raises(NotImplementedError):
        parse_geotiff(p)
    with open(p, "wb") as f:
        f.write(b"GARBAGE!")
    with pytest.raises(ValueError):
        parse_geotiff(p)


# ---------------------------------------------------------------------------
# LZW / PackBits codecs (TIFF 6.0 §13 / §9)
# ---------------------------------------------------------------------------


def test_lzw_golden_decode():
    """Hand-packed 9-bit MSB-first stream, independent of our encoder:
    codes [Clear, 'A', 'B', 258(='AB'), EOI] -> b'ABAB'."""
    from richdem_spark.gtiff import lzw_decode

    golden = bytes([0x80, 0x10, 0x48, 0x50, 0x28, 0x08])
    assert lzw_decode(golden) == b"ABAB"


def test_packbits_golden_decode():
    """The TIFF 6.0 §9 worked example."""
    from richdem_spark.gtiff import packbits_decode

    src = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    out = packbits_decode(src)
    assert out == (b"\xaa" * 3 + b"\x80\x00\x2a" + b"\xaa" * 4
                   + b"\x80\x00\x2a\x22" + b"\xaa" * 10)


def test_lzw_roundtrip_exercises_width_bumps_and_reset():
    """Random payloads long enough to push the code table through every
    width bump (511/1023/2047) and the table-full Clear reset."""
    from richdem_spark.gtiff import lzw_decode, lzw_encode

    rng = np.random.default_rng(17)
    for n in (0, 1, 300, 5_000, 40_000):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert lzw_decode(lzw_encode(data)) == data
    # highly repetitive data (long runs -> deep table strings)
    rep = (b"abcabd" * 3000) + b"\x00" * 4000
    assert lzw_decode(lzw_encode(rep)) == rep


def test_packbits_roundtrip():
    from richdem_spark.gtiff import packbits_decode, packbits_encode

    rng = np.random.default_rng(5)
    for n in (0, 1, 2, 3, 129, 400):
        data = rng.integers(0, 4, n, dtype=np.uint8).tobytes()
        assert packbits_decode(packbits_encode(data)) == data
    runs = b"\x07" * 500 + b"\x01\x02" + b"\x09" * 3 + b"\x04"
    assert packbits_decode(packbits_encode(runs)) == runs


@pytest.mark.parametrize("codec", ["lzw", "packbits"])
def test_roundtrip_compressed_file(spark, tmp_path, codec):
    """Full-file round-trip through the distributed reader for both new
    codecs (LZW is what real USGS/Copernicus DEM tiles ship)."""
    rng = np.random.default_rng(23)
    arr = (rng.random((41, 33)) * 200).astype("int32")
    tr = raster_from_array(spark, arr, tile_w=16, tile_h=16,
                           nodata=-7.0)
    p = str(tmp_path / f"{codec}.tif")
    write_geotiff(tr, p, compress=codec, rows_per_strip=8)
    info = parse_geotiff(p)
    assert info["compression"] == (5 if codec == "lzw" else 32773)
    back = read_geotiff(spark, p, tile_w=8, tile_h=8)
    assert back.meta.nodata == -7.0
    np.testing.assert_array_equal(back.to_array(), arr)


def test_big_single_strip_is_split(spark, tmp_path):
    """GDAL-style single huge uncompressed strip must not degenerate to
    one decode task: the reader splits it into row-range sub-segments."""
    from richdem_spark.gtiff import _SEG_SCHEMA  # noqa: F401

    rng = np.random.default_rng(31)
    arr = (rng.random((600, 40)) * 10).astype("float32")
    tr = raster_from_array(spark, arr, tile_w=64, tile_h=64)
    p = str(tmp_path / "onestrip.tif")
    write_geotiff(tr, p, compress=False, rows_per_strip=600)
    info = parse_geotiff(p)
    assert len(info["segments"]) == 1          # the file IS one strip
    back = read_geotiff(spark, p, tile_w=64, tile_h=64)
    np.testing.assert_array_equal(back.to_array(), arr)


def test_write_rejects_rotated_and_southup(spark, tmp_path):
    """ModelPixelScale/ModelTiepoint cannot express rotation or south-up
    scales; writing must raise instead of silently mangling them."""
    arr = np.ones((8, 8), "float32")
    p = str(tmp_path / "rot.tif")
    rot = raster_from_array(
        spark, arr, tile_w=8, tile_h=8,
        geotransform=(0.0, 1.0, 0.3, 0.0, 0.0, -1.0))
    with pytest.raises(NotImplementedError):
        write_geotiff(rot, p)
    south = raster_from_array(
        spark, arr, tile_w=8, tile_h=8,
        geotransform=(0.0, 1.0, 0.0, 0.0, 0.0, 2.0))
    with pytest.raises(NotImplementedError):
        write_geotiff(south, p)


def test_bigtiff_roundtrip(spark, tmp_path):
    """BigTIFF (magic 43, 8-byte offsets, LONG8 strip offsets) must
    round-trip byte-exact through the same distributed read path."""
    rng = np.random.default_rng(21)
    arr = (rng.random((41, 33)) * 200 - 50).astype("float32")
    gt = (100.0, 2.0, 0.0, 900.0, 0.0, -2.0)
    tr = raster_from_array(spark, arr, tile_w=16, tile_h=16,
                           nodata=-9999.0, geotransform=gt)
    p = str(tmp_path / "big.tif")
    write_geotiff(tr, p, compress="lzw", rows_per_strip=7, big=True)
    with open(p, "rb") as f:
        hdr = f.read(4)
    assert hdr[:2] == b"II" and hdr[2] == 43
    info = parse_geotiff(p)
    assert (info["width"], info["height"]) == (33, 41)
    assert info["nodata"] == -9999.0
    assert info["geotransform"][:2] == (100.0, 2.0)
    back = read_geotiff(spark, p, tile_w=8, tile_h=8)
    np.testing.assert_array_equal(back.to_array(), arr)


def test_bigtiff_tiled_uncompressed_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(22)
    arr = (rng.random((30, 47)) * 1000).astype("int32")
    tr = raster_from_array(spark, arr, tile_w=16, tile_h=16)
    p = str(tmp_path / "bigtiled.tif")
    write_geotiff(tr, p, compress=False, tiled=16, big=True)
    info = parse_geotiff(p)
    assert len(info["segments"]) >= 6
    back = read_geotiff(spark, p, tile_w=13, tile_h=9)
    np.testing.assert_array_equal(back.to_array(), arr)


def test_bigtiff_bad_offset_size_raises(tmp_path):
    import struct

    p = str(tmp_path / "bad.tif")
    with open(p, "wb") as f:
        f.write(b"II" + struct.pack("<HHHQ", 43, 4, 0, 16))
    with pytest.raises(NotImplementedError):
        parse_geotiff(p)
