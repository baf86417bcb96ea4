"""Watershed labels, breach op, SPI/CTI, aggregation utilities."""

import numpy as np

from richdem_spark.api import (
    CTI,
    BreachDepressions,
    CountVal,
    FillDepressions,
    FlowAccumulation,
    FlowDirectionsD8,
    NumDataCells,
    RasterCompare,
    RasterEquals,
    RasterMinMax,
    SPI,
    TerrainAttribute,
    WatershedLabels,
)
from richdem_spark.kernels.breach import breach_drainage_tree
from richdem_spark.kernels.d8 import d8_flow_directions, exit_cell_of
from richdem_spark.kernels.fill import priority_flood_fill_epsilon
from richdem_spark.tiles import raster_from_array


def _dem(seed=3, n=33):
    rng = np.random.default_rng(seed)
    return rng.normal(50, 8, (n, n)).round(1)


def test_watershed_labels_match_single_grid(spark):
    dem = _dem(5, 30)
    filled = priority_flood_fill_epsilon(dem)
    dirs = d8_flow_directions(filled)
    term = exit_cell_of(dirs)  # single grid: terminal == global exit
    tr = raster_from_array(spark, filled, tile_w=9, tile_h=11)
    got = WatershedLabels(tr, epsilon=True).to_array()
    assert np.array_equal(got, term.reshape(dem.shape))
    # watershed count is modest and labels partition the grid
    assert len(np.unique(got)) < dem.size


def test_breach_op_matches_kernel(spark):
    """The distributed breach equals its serial drainage-tree twin
    (the engine's canonical semantics; the reference (z,k) kernel
    differs only in tie-channel choice — see kernels/breach.py)."""
    dem = _dem(7, 25)
    golden = breach_drainage_tree(dem)
    tr = raster_from_array(spark, dem, tile_w=8, tile_h=8)
    got = BreachDepressions(tr).to_array()
    assert np.array_equal(got, golden)


def test_spi_cti(spark):
    dem = _dem(9, 24)
    tr = raster_from_array(spark, dem, tile_w=12, tile_h=12)
    filled = FillDepressions(tr)
    acc = FlowAccumulation(filled, "D8")
    slope = TerrainAttribute(filled, "slope_percentage")
    spi = SPI(acc, slope).to_array()
    cti = CTI(acc, slope).to_array()
    assert spi.shape == dem.shape
    assert np.isfinite(spi).all()
    assert np.isfinite(cti).all()
    # SPI + CTI = 2*ln(accum/area) when slope terms cancel:
    # ln(a*s) + ln(a/s) = 2 ln a
    a = acc.to_array()
    s = slope.to_array() / 100.0 + 0.001
    assert np.allclose(spi + cti, 2 * np.log(a), atol=1e-9)


def test_aggregations(spark):
    dem = _dem(11, 20)
    dem[3, 4] = -9999.0
    tr = raster_from_array(spark, dem, tile_w=7, tile_h=7, nodata=-9999.0)
    lo, hi = RasterMinMax(tr)
    valid = dem[dem != -9999.0]
    assert lo == valid.min() and hi == valid.max()
    assert NumDataCells(tr) == dem.size - 1
    assert CountVal(tr, float(dem[0, 0])) == int(
        (dem == dem[0, 0]).sum()
    )


def test_raster_equality_and_compare(spark):
    dem = _dem(13, 18)
    a = raster_from_array(spark, dem, tile_w=6, tile_h=6)
    b = raster_from_array(spark, dem + 0.5, tile_w=6, tile_h=6)
    same = raster_from_array(spark, dem.copy(), tile_w=6, tile_h=6)
    assert RasterEquals(a, same)
    assert not RasterEquals(a, b)
    stats = RasterCompare(b, a)
    assert abs(stats["avg_diff"] - 0.5) < 1e-9
    assert abs(stats["max_abs_diff"] - 0.5) < 1e-9
    assert abs(stats["rms_diff"] - 0.5) < 1e-9
