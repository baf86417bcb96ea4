"""Layoutfile mosaics (common/Layoutfile.hpp contract):
split -> manifest -> merge round-trips, blank-slot NoData, CLI."""

import os

import numpy as np
import pytest

from richdem_spark.layout import parse_layoutfile, read_layout, write_layout
from richdem_spark.tiles import raster_from_array


def test_split_merge_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(3)
    arr = (rng.random((32, 48)) * 100).astype("float32")
    tr = raster_from_array(spark, arr, tile_w=16, tile_h=16,
                           nodata=-9999.0,
                           geotransform=(500.0, 2.0, 0.0, 900.0, 0.0,
                                         -2.0))
    lp = write_layout(tr, str(tmp_path / "mosaic"))
    assert os.path.exists(lp)
    grid = parse_layoutfile(lp)
    assert len(grid) == 2 and len(grid[0]) == 3
    assert all(all(p for p in row) for row in grid)

    back = read_layout(spark, lp)
    assert back.meta.nodata == -9999.0
    assert back.meta.geotransform[0] == 500.0
    assert back.meta.geotransform[3] == 900.0
    np.testing.assert_array_equal(back.to_array(), arr)


def test_blank_slots_become_nodata(spark, tmp_path):
    rng = np.random.default_rng(5)
    arr = (rng.random((16, 32)) * 10).astype("float64")
    tr = raster_from_array(spark, arr, tile_w=16, tile_h=16,
                           nodata=-1.0)
    lp = write_layout(tr, str(tmp_path / "m2"))
    # blank out the second tile in the manifest (Layoutfile blanks
    # mean "no tile there")
    lines = open(lp).read().splitlines()
    first = lines[0].split(",")
    first[1] = ""
    open(lp, "w").write(",".join(first) + "\n")

    back = read_layout(spark, lp).to_array()
    np.testing.assert_array_equal(back[:, :16], arr[:, :16])
    assert (back[:, 16:] == -1.0).all()


def test_ragged_raster_rejected(spark, tmp_path):
    arr = np.zeros((20, 20))
    tr = raster_from_array(spark, arr, tile_w=16, tile_h=16)
    with pytest.raises(ValueError):
        write_layout(tr, str(tmp_path / "m3"))


def test_mixed_ascii_tiles_and_shape_mismatch(spark, tmp_path):
    from richdem_spark.kernels.ascii_io import write_ascii_grid

    d = tmp_path / "m4"
    d.mkdir()
    a = np.arange(12, dtype=float).reshape(3, 4)
    b = a + 100
    (d / "a.asc").write_text(write_ascii_grid(a))
    (d / "b.asc").write_text(write_ascii_grid(b))
    (d / "lay.layout").write_text("a.asc,b.asc\n")
    got = read_layout(spark, str(d / "lay.layout")).to_array()
    np.testing.assert_array_equal(got, np.hstack([a, b]))

    bad = np.zeros((2, 2))
    (d / "c.asc").write_text(write_ascii_grid(bad))
    (d / "bad.layout").write_text("a.asc,c.asc\n")
    with pytest.raises(Exception):
        read_layout(spark, str(d / "bad.layout")).to_array()


def test_cli_merge_split(spark, tmp_path, capsys):
    from richdem_spark.cli import main

    rng = np.random.default_rng(9)
    arr = (rng.random((32, 32)) * 50).astype("float32")
    tr = raster_from_array(spark, arr, tile_w=16, tile_h=16)
    src = str(tmp_path / "src.tif")
    from richdem_spark.gtiff import write_geotiff

    write_geotiff(tr, src)
    mosaic_dir = str(tmp_path / "mosaic")
    assert main(["--tile", "16", "split-layout", src, mosaic_dir]) == 0
    lp = capsys.readouterr().out.strip()
    merged = str(tmp_path / "merged.tif")
    assert main(["merge-layout", lp, merged]) == 0
    from richdem_spark.gtiff import read_geotiff

    np.testing.assert_array_equal(
        read_geotiff(spark, merged).to_array(), arr)
