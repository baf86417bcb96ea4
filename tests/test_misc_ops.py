"""Canvas/orientation/misc operators vs NumPy oracles (BucketFill golden
behavior mirrors tests/tests.cpp:377-428)."""

import numpy as np

from richdem_spark.api import (
    ArcGISFlowdirs,
    BucketFill,
    Expand,
    FlipHorz,
    FlipVert,
    Histogram,
    SetEdges,
    Transpose,
    UpslopeCells,
)
from richdem_spark.kernels.d8 import d8_flow_directions
from richdem_spark.kernels.fill import priority_flood_fill_epsilon
from richdem_spark.kernels.misc import bucket_fill, d8_upslope_cells
from richdem_spark.tiles import raster_from_array


def test_flips_and_transpose(spark):
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 50, (24, 32)).astype(np.float64)
    tr = raster_from_array(spark, arr, tile_w=8, tile_h=8)
    assert np.array_equal(FlipVert(tr).to_array(), np.flipud(arr))
    assert np.array_equal(FlipHorz(tr).to_array(), np.fliplr(arr))
    assert np.array_equal(Transpose(tr).to_array(), arr.T)
    # ragged tiling: distributed piece-split path (both axes + transpose)
    tr2 = raster_from_array(spark, arr, tile_w=7, tile_h=5)
    assert np.array_equal(FlipVert(tr2).to_array(), np.flipud(arr))
    assert np.array_equal(FlipHorz(tr2).to_array(), np.fliplr(arr))
    t2 = Transpose(tr2)
    assert np.array_equal(t2.to_array(), arr.T)
    assert (t2.meta.tile_w, t2.meta.tile_h) == (5, 7)
    # flip/transpose results must stay usable as tiled rasters
    assert np.array_equal(
        Transpose(t2).to_array(), arr
    )


def test_expand_setedges(spark):
    arr = np.arange(20.0).reshape(4, 5)
    tr = raster_from_array(spark, arr, tile_w=3, tile_h=3)
    ex = Expand(tr, 8, 6, -1.0).to_array()
    assert ex.shape == (6, 8)
    assert np.array_equal(ex[:4, :5], arr)
    assert (ex[4:, :] == -1).all() and (ex[:, 5:] == -1).all()
    se = SetEdges(tr, 99.0).to_array()
    assert (se[0, :] == 99).all() and (se[:, -1] == 99).all()
    assert np.array_equal(se[1:-1, 1:-1], arr[1:-1, 1:-1])


def test_bucket_fill_semantics(spark):
    # mirrors the reference's BucketFill test structure
    # (tests/tests.cpp:377-428): fill check_value regions reachable from
    # the edges
    g = np.full((7, 7), 1.0)
    g[2:5, 2:5] = 0.0  # interior island of 0s NOT connected to edges
    g[0, 0] = 0.0      # edge zero
    tr = raster_from_array(spark, g, tile_w=4, tile_h=4)
    out = BucketFill(tr, check_value=0.0, fill_value=7.0).to_array()
    assert out[0, 0] == 7.0
    assert (out[2:5, 2:5] == 0.0).all()  # island untouched
    oracle = bucket_fill(g, [(0, 0)], 0.0, 7.0)
    assert np.array_equal(out, oracle)


def test_upslope_cells(spark):
    dem = priority_flood_fill_epsilon(
        np.random.default_rng(5).normal(50, 5, (20, 20)).round(1)
    )
    dirs = d8_flow_directions(dem)
    golden = d8_upslope_cells(dirs, 5, 10, 14, 10)
    tr = raster_from_array(spark, dirs, tile_w=8, tile_h=8)
    got = UpslopeCells(tr, 5, 10, 14, 10).to_array()
    assert np.array_equal(got, golden)
    assert (golden == 1).sum() == 10  # the seed line
    assert (golden == 2).any()


def test_histogram_and_arcgis(spark):
    arr = np.array([[1.0, 1.0, 2.0], [2.0, 2.0, 3.0]])
    tr = raster_from_array(spark, arr, tile_w=2, tile_h=2)
    h = Histogram(tr)
    assert h == {"1.0": 2, "2.0": 3, "3.0": 1}
    dirs = np.array([[0, 1, 2], [3, 4, 5]], dtype=np.uint8)
    td = raster_from_array(spark, dirs, tile_w=3, tile_h=2)
    arc = ArcGISFlowdirs(td).to_array()
    assert np.array_equal(arc, np.array([[0, 16, 32], [64, 128, 1]]))


def test_perimeter(spark):
    arr = np.full((10, 12), 5.0)
    arr[4:6, 4:6] = -9999.0  # interior NoData hole
    tr = raster_from_array(spark, arr, tile_w=5, tile_h=5, nodata=-9999.0)
    from richdem_spark.api import Perimeter

    # CELL_COUNT: all grid-border cells are data
    assert Perimeter(tr, "CELL_COUNT") == 2 * 10 + 2 * 12 - 4
    # SQUARE_EDGE: outer boundary edges + the 2x2 hole's 8 edges
    assert Perimeter(tr, "SQUARE_EDGE") == (2 * 10 + 2 * 12) + 8


def test_reference_style_smoke_all_methods(spark):
    """Mirror of the reference's Beauford smoke test
    (tests/tests.cpp:357-373): fill the DEM, then run every flow
    accumulation method without error."""
    from richdem_spark.api import FillDepressions, FlowAccumulation
    from richdem_spark.kernels.perlin import generate_perlin_terrain

    dem = generate_perlin_terrain(96, seed=7)
    tr = raster_from_array(spark, dem, tile_w=32, tile_h=32)
    filled = FillDepressions(tr).persist()
    for method in ("D8", "OCallaghanD8", "Rho8", "Quinn", "Holmgren",
                   "Freeman", "Tarboton", "Dinfinity"):
        acc = FlowAccumulation(filled, method).to_array()
        assert acc.max() >= 1.0, method
        assert np.isfinite(acc[acc >= 0]).all(), method


def test_fill_max_dep_api(spark):
    """API-level max_dep fill at two tilings vs the reference goldens."""
    from richdem_spark.api import FillDepressionsMaxDep
    from richdem_spark.kernels.ascii_io import read_ascii_grid

    dem, _ = read_ascii_grid(
        "/root/reference/tests/depressions/testdem1.dem")
    for k in (1, 2):
        exp, _ = read_ascii_grid(
            f"/root/reference/tests/depressions/testdem1.{k}.out")
        for tw, th in ((4, 4), (7, 3)):
            tr = raster_from_array(spark, dem, tile_w=tw, tile_h=th)
            got = FillDepressionsMaxDep(tr, k).to_array()
            assert np.array_equal(got, exp), (k, tw, th)


def test_bucket_fill_distributed_fuzz(spark):
    """Distributed BucketFill == the single-grid kernel on random masks
    at multiple tilings (snaking regions cross many seams)."""
    from richdem_spark.kernels.misc import bucket_fill_from_edges as bk

    rng = np.random.default_rng(99)
    for trial in range(3):
        h, w = int(rng.integers(18, 34)), int(rng.integers(18, 34))
        g = (rng.random((h, w)) < 0.55).astype(np.float64)
        golden = bk(g, 1.0, 7.0)
        for tw, th in ((8, 8), (5, 9)):
            tr = raster_from_array(spark, g, tile_w=tw, tile_h=th)
            got = BucketFill(tr, 1.0, 7.0).to_array()
            assert np.array_equal(got, golden), (trial, tw, th)


def test_upslope_cells_distributed_fuzz(spark):
    """Distributed UpslopeCells == the single-grid kernel with flow paths
    crossing several tiles."""
    rng = np.random.default_rng(101)
    for trial in range(3):
        dem = priority_flood_fill_epsilon(
            rng.normal(50, 5, (28, 30)).round(1))
        dirs = d8_flow_directions(dem)
        golden = d8_upslope_cells(dirs, 4, 14, 22, 14)
        for tw, th in ((8, 8), (11, 7)):
            tr = raster_from_array(spark, dirs, tile_w=tw, tile_h=th)
            got = UpslopeCells(tr, 4, 14, 22, 14).to_array()
            assert np.array_equal(got, golden), (trial, tw, th)


def test_fill_max_dep_distributed_fuzz(spark):
    """Distributed max_dep fill == the serial episode kernel on random
    tie-free grids at multiple tilings (exact on tie-free inputs; the
    trigger-grouping reduction is derived in ops/maxdep.py)."""
    from richdem_spark.api import FillDepressionsMaxDep
    from richdem_spark.kernels.fill import priority_flood_max_dep

    rng = np.random.default_rng(31)
    for trial in range(3):
        dem = rng.random((21, 17)) * 10
        for k in (1, 3, 8, 1000):
            exp = priority_flood_max_dep(dem, k)
            for tw, th in ((6, 6), (9, 5)):
                tr = raster_from_array(spark, dem, tile_w=tw, tile_h=th)
                got = FillDepressionsMaxDep(tr, k).to_array()
                assert np.array_equal(got, exp), (trial, k, tw, th)


def test_fill_max_dep_tiling_invariant_on_ties(spark):
    """On tie-heavy integer grids (where the reference's own episode
    grouping is heap-order-dependent) the distributed result must at
    least be deterministic and tiling-invariant."""
    from richdem_spark.api import FillDepressionsMaxDep

    rng = np.random.default_rng(77)
    dem = rng.integers(0, 5, (19, 23)).astype(float)
    for k in (1, 2, 6):
        outs = []
        for tw, th in ((5, 5), (8, 4), (23, 19)):
            tr = raster_from_array(spark, dem, tile_w=tw, tile_h=th)
            outs.append(FillDepressionsMaxDep(tr, k).to_array())
        assert np.array_equal(outs[0], outs[1]), k
        assert np.array_equal(outs[0], outs[2]), k
        # monotone envelope: dem <= result <= plain fill
        from richdem_spark.kernels.fill import priority_flood_fill
        full = priority_flood_fill(dem, nodata=None)
        assert (outs[0] >= dem).all() and (outs[0] <= full).all(), k
