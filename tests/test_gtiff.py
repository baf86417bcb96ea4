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
