"""The apps/rd_* CLI surface (richdem_spark.cli) — in-process, reusing
the session fixture (main() only stops sessions it created)."""

import json

import numpy as np
import pytest

from richdem_spark.cli import main
from richdem_spark.kernels.ascii_io import read_ascii_grid

DEM = "/root/reference/tests/depressions/testdem1.dem"
GOLDEN = "/root/reference/tests/depressions/testdem1.all.out"


def test_cli_fill_matches_golden(spark, tmp_path):
    out = str(tmp_path / "filled.asc")
    assert main(["fill", DEM, out]) == 0
    got, _ = read_ascii_grid(out)
    exp, _ = read_ascii_grid(GOLDEN)
    np.testing.assert_allclose(got, exp)


def test_cli_fill_geotiff_roundtrip(spark, tmp_path):
    out = str(tmp_path / "filled.tif")
    assert main(["fill", DEM, out, "--epsilon"]) == 0
    from richdem_spark.gtiff import parse_geotiff

    info = parse_geotiff(out)
    assert (info["width"], info["height"]) == (10, 10)


def test_cli_accum_and_strahler(spark, tmp_path):
    filled = str(tmp_path / "f.tif")
    acc = str(tmp_path / "acc.tif")
    stra = str(tmp_path / "s.tif")
    assert main(["fill", DEM, filled, "--epsilon"]) == 0
    assert main(["accum", filled, acc]) == 0
    assert main(["strahler", filled, stra]) == 0
    from richdem_spark.gtiff import read_geotiff

    a = read_geotiff(spark, acc).to_array()
    s = read_geotiff(spark, stra).to_array()
    assert a.max() > 1        # something accumulated
    assert s.max() >= 1 and s.dtype == np.int32


def test_cli_hist_info_surface_area(spark, tmp_path, capsys):
    assert main(["hist", DEM]) == 0
    out = capsys.readouterr().out
    assert "Nodata" in out
    assert main(["info", DEM]) == 0
    meta = json.loads(capsys.readouterr().out)
    assert meta["width"] == 10 and meta["data_cells"] > 0
    assert main(["surface-area", DEM]) == 0
    assert float(capsys.readouterr().out.strip()) > 0


def test_cli_compare_and_has_depressions(spark, tmp_path, capsys):
    filled = str(tmp_path / "f.asc")
    assert main(["fill", DEM, filled]) == 0
    # identical rasters compare equal, exit 0
    assert main(["compare", filled, filled]) == 0
    capsys.readouterr()
    # raw DEM has depressions (exit 1), filled does not (exit 0)
    assert main(["has-depressions", DEM]) == 1
    assert "has_depressions" in capsys.readouterr().out
    assert main(["has-depressions", filled]) == 0


def test_cli_terrain_and_pit_mask(spark, tmp_path):
    slope = str(tmp_path / "slope.tif")
    mask = str(tmp_path / "pits.tif")
    assert main(["terrain", DEM, slope, "--attrib", "slope_riserun"]) == 0
    assert main(["pit-mask", DEM, mask]) == 0
    from richdem_spark.gtiff import read_geotiff

    m = read_geotiff(spark, mask).to_array()
    assert set(np.unique(m)).issubset({0.0, 1.0, 3.0, -1.0})


def test_cli_unknown_attrib_raises(spark, tmp_path):
    with pytest.raises(KeyError):
        main(["terrain", DEM, str(tmp_path / "x.tif"),
              "--attrib", "nope"])


def test_cli_flood_flowdirs_watershed_nodata_history(spark, tmp_path,
                                                     capsys):
    dirs = str(tmp_path / "dirs.tif")
    ws = str(tmp_path / "ws.tif")
    assert main(["flood-flowdirs", DEM, dirs]) == 0
    assert main(["watershed", DEM, ws]) == 0
    from richdem_spark.gtiff import read_geotiff

    d = read_geotiff(spark, dirs).to_array()
    assert d.min() >= 0 and d.max() <= 255
    # no-data: get, then set on a copy
    assert main(["no-data", DEM]) == 0
    assert capsys.readouterr().out.strip() == "9.0"
    nd_out = str(tmp_path / "nd.tif")
    assert main(["no-data", DEM, "--set", "-1.0",
                 "--output", nd_out]) == 0
    from richdem_spark.gtiff import parse_geotiff

    assert parse_geotiff(nd_out)["nodata"] == -1.0
    # history: the fill output records its op
    filled = str(tmp_path / "f2")
    assert main(["fill", DEM, filled]) == 0
    assert main(["history", filled]) == 0
    assert "fill_depressions" in capsys.readouterr().out


def test_cli_dephier_and_fsm(spark, tmp_path, capsys):
    labels = str(tmp_path / "labels.tif")
    assert main(["dephier", DEM, labels]) == 0
    deps = json.loads(capsys.readouterr().out)
    assert isinstance(deps, list) and len(deps) >= 1
    assert all("dep_label" in d for d in deps)

    # fsm: tiny uniform water layer over the DEM
    from richdem_spark.kernels.ascii_io import read_ascii_grid as _rag

    dem_arr, dmeta = _rag(DEM)
    wtd_arr = np.full(dem_arr.shape, 0.05)
    wtd_arr[dem_arr == dmeta.get("nodata_value")] = 0.0
    from richdem_spark.tiles import raster_from_array, write_raster

    wtd_path = str(tmp_path / "wtd_table")
    write_raster(raster_from_array(spark, wtd_arr, tile_w=256,
                                   tile_h=256), wtd_path)
    fsm_out = str(tmp_path / "water.tif")
    assert main(["fsm", DEM, fsm_out, "--wtd", wtd_path]) == 0
    from richdem_spark.gtiff import read_geotiff

    water = read_geotiff(spark, fsm_out).to_array()
    assert water.shape == dem_arr.shape
    assert float(np.nanmax(water)) >= 0.0


def test_cli_geotransform_projection(spark, tmp_path, capsys):
    # get
    assert main(["geotransform", DEM]) == 0
    gt = json.loads(capsys.readouterr().out)
    assert len(gt) == 6 and gt[1] == 3.0
    # set geotransform on a copy (tile-table output keeps projection)
    out = str(tmp_path / "gt_out")
    assert main(["geotransform", DEM, "--set", "10", "2", "0", "99",
                 "0", "-2", "--output", out]) == 0
    assert main(["geotransform", out]) == 0
    assert json.loads(capsys.readouterr().out) == [10, 2, 0, 99, 0, -2]
    assert main(["projection", out, "--set", "EPSG:26915",
                 "--output", str(tmp_path / "pj_out")]) == 0
    assert main(["projection", str(tmp_path / "pj_out")]) == 0
    assert capsys.readouterr().out.strip() == "EPSG:26915"
