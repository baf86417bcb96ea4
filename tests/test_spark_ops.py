"""Distributed operators vs the single-grid NumPy oracle kernels — the
same cross-parallelism comparison strategy the reference uses for its MPI
programs (programs/parallel_priority_flood/test.py,
programs/parallel_d8_accum/test_small.sh)."""

import numpy as np
import pytest

from richdem_spark.api import (
    FillDepressions,
    FindFlats,
    FlowAccumulation,
    FlowAccumulationFromDirs,
    FlowDirectionsD8,
    TerrainAttribute,
)
from richdem_spark.kernels import terrain as tkern
from richdem_spark.kernels.ascii_io import read_ascii_grid
from richdem_spark.kernels.d8 import d8_flow_accum, d8_flow_directions
from richdem_spark.kernels.fill import priority_flood_fill
from richdem_spark.tiles import raster_from_array

REF = "/root/reference/tests"


def _random_dem(seed, h=37, w=41):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 60, (h, w)).astype(np.float64)
    return base


@pytest.mark.parametrize("tile", [7, 16, 64])
def test_distributed_fill_matches_kernel(spark, tile):
    dem = _random_dem(3)
    golden = priority_flood_fill(dem)
    tr = raster_from_array(spark, dem, tile_w=tile, tile_h=tile)
    got = FillDepressions(tr).to_array()
    assert np.array_equal(got, golden)


def test_distributed_fill_golden_fixture(spark):
    dem, meta = read_ascii_grid(f"{REF}/depressions/testdem1.dem")
    expected, _ = read_ascii_grid(f"{REF}/depressions/testdem1.all.out")
    tr = raster_from_array(spark, dem, tile_w=4, tile_h=4,
                           nodata=meta["nodata_value"])
    got = FillDepressions(tr).to_array()
    assert np.array_equal(got, expected)


@pytest.mark.parametrize("tile", [7, 16])
def test_distributed_flowdirs_match_kernel(spark, tile):
    dem = priority_flood_fill(_random_dem(5))
    golden = d8_flow_directions(dem)
    tr = raster_from_array(spark, dem, tile_w=tile, tile_h=tile)
    got = FlowDirectionsD8(tr).to_array()
    assert np.array_equal(got, golden)


@pytest.mark.parametrize("tile", [5, 13, 64])
def test_distributed_accum_matches_kernel(spark, tile):
    dem = priority_flood_fill(_random_dem(11))
    dirs = d8_flow_directions(dem)
    golden = d8_flow_accum(dirs)
    tr = raster_from_array(spark, dem, tile_w=tile, tile_h=tile)
    got = FlowAccumulation(tr, "D8").to_array()
    assert np.array_equal(got, golden)
    # mass conservation: every data cell contributes exactly once and all
    # flow reaches the edge or a sink; totals must match the oracle
    assert got.sum() == golden.sum()


def test_distributed_accum_golden_fixture(spark):
    dirs, meta = read_ascii_grid(f"{REF}/flow_accum/testdem5.d8")
    nodata = meta["nodata_value"]
    d = dirs.astype(np.int64)
    d[dirs == nodata] = 255
    expected, _ = read_ascii_grid(f"{REF}/flow_accum/testdem5.out")
    tr = raster_from_array(spark, d.astype(np.uint8), tile_w=3, tile_h=4,
                           nodata=255.0)
    got = FlowAccumulationFromDirs(tr).to_array()
    assert np.array_equal(got, expected)


def test_terrain_attributes_match_kernel(spark):
    dem = _random_dem(13).astype(np.float64)
    tr = raster_from_array(spark, dem, tile_w=16, tile_h=16)
    for attrib, kern in [
        ("slope_riserun", tkern.slope_riserun),
        ("aspect", tkern.aspect),
        ("curvature", tkern.curvature),
        ("profile_curvature", tkern.profile_curvature),
        ("planform_curvature", tkern.planform_curvature),
    ]:
        golden = kern(dem)
        got = TerrainAttribute(tr, attrib).to_array()
        assert np.allclose(got, golden, atol=1e-12), attrib


def test_find_flats_matches_kernel(spark):
    dem = _random_dem(17)
    dem[10:20, 10:20] = 5.0  # a flat
    golden = tkern.find_flats(dem)
    tr = raster_from_array(spark, dem, tile_w=8, tile_h=8)
    got = FindFlats(tr).to_array()
    assert np.array_equal(got, golden)


def test_fa_methods_tiling_invariant(spark):
    """FM-composed SFD accumulation is identical at any tiling (incl.
    Rho8's seeded per-cell RNG) — the cluster-size-invariance property."""
    from richdem_spark.api import FlowAccumulation

    dem = priority_flood_fill(_random_dem(23, 30, 30))
    for method in ("OCallaghanD8", "Rho8"):
        single = FlowAccumulation(
            raster_from_array(spark, dem, tile_w=64, tile_h=64), method
        ).to_array()
        tiled = FlowAccumulation(
            raster_from_array(spark, dem, tile_w=13, tile_h=9), method
        ).to_array()
        assert np.array_equal(single, tiled), method


def test_mfd_accumulation_single_tile(spark):
    from richdem_spark.api import FlowAccumulation
    from richdem_spark.kernels.flowmet import fm_quinn, prop_flow_accum

    dem = priority_flood_fill(_random_dem(29, 20, 20))
    golden = prop_flow_accum(fm_quinn(dem))
    tr = raster_from_array(spark, dem, tile_w=64, tile_h=64)
    got = FlowAccumulation(tr, "Quinn").to_array()
    assert np.allclose(got, golden)


@pytest.mark.parametrize("method", ["Quinn", "Freeman", "Holmgren",
                                    "Tarboton"])
def test_mfd_accumulation_distributed(spark, method):
    """Iterative seam-exchange MFD == single-grid oracle at any tiling
    (linearity of accumulation in its sources)."""
    from richdem_spark.api import FlowAccumulation
    from richdem_spark.kernels import flowmet as fmk

    dem = priority_flood_fill(_random_dem(31, 26, 23))
    fm = {
        "Quinn": fmk.fm_quinn,
        "Freeman": fmk.fm_freeman,
        "Holmgren": fmk.fm_holmgren,
        "Tarboton": fmk.fm_tarboton,
    }[method]
    golden = fmk.prop_flow_accum(fm(dem, None))
    tr = raster_from_array(spark, dem, tile_w=7, tile_h=10)
    got = FlowAccumulation(tr, method).to_array()
    assert np.allclose(got, golden, atol=1e-9), method


def test_dinf_directions_distributed(spark):
    from richdem_spark.api import FlowDirectionsDinf
    from richdem_spark.kernels.flowmet import dinf_flow_directions

    dem = priority_flood_fill(_random_dem(31, 24, 24))
    golden = dinf_flow_directions(dem)
    tr = raster_from_array(spark, dem, tile_w=7, tile_h=10)
    got = FlowDirectionsDinf(tr).to_array()
    assert np.allclose(got, golden)


def test_weighted_accumulation(spark):
    """weights raster == reference's weights argument; distributed
    two-round result must equal the kernel oracle at any tiling."""
    from richdem_spark.api import FlowAccumulationFromDirs

    dem = priority_flood_fill(_random_dem(41, 22, 27))
    dirs = d8_flow_directions(dem)
    rng = np.random.default_rng(8)
    w = rng.uniform(0.5, 2.0, dem.shape).round(3)
    golden = d8_flow_accum(dirs, weights=w)
    dirs_tr = raster_from_array(spark, dirs, tile_w=9, tile_h=8)
    w_tr = raster_from_array(spark, w, tile_w=9, tile_h=8)
    got = FlowAccumulationFromDirs(dirs_tr, weights=w_tr).to_array()
    assert np.allclose(got, golden, atol=1e-9)


def test_multi_tile_d4_epsilon_drainage(spark):
    """Multi-tile D4 epsilon fill: every interior cell must have a
    strictly-lower D4 neighbour (the epsilon drainage property), exact
    across tile seams."""
    from richdem_spark.api import FillDepressions
    from richdem_spark.constants import TOPO_D4
    from richdem_spark.kernels.fill import priority_flood_fill_pq
    from richdem_spark.tiles import raster_from_array

    rng = np.random.default_rng(55)
    dem = rng.integers(0, 40, (22, 26)).astype(np.float64)
    tr = raster_from_array(spark, dem, tile_w=8, tile_h=8)
    out = FillDepressions(tr, epsilon=True, topology=TOPO_D4).to_array()
    # same fill levels as the serial PF-epsilon up to nextafter chains
    # (the distributed path applies fill + D4 flats gradients, a valid
    # epsilon assignment; byte-equality only holds single-tile)
    golden = priority_flood_fill_pq(dem, None, TOPO_D4, epsilon=True)
    assert (out >= dem).all()
    assert float(np.abs(out - golden).max()) <= 1e-9
    lower = np.zeros(dem.shape, dtype=bool)
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        h, w = dem.shape
        sl_d = (slice(max(0, -dy), h - max(0, dy)),
                slice(max(0, -dx), w - max(0, dx)))
        sl_s = (slice(max(0, dy), h - max(0, -dy)),
                slice(max(0, dx), w - max(0, -dx)))
        lower[sl_d] |= out[sl_s] < out[sl_d]
    assert lower[1:-1, 1:-1].all()


def test_executor_side_graph_solves(spark, monkeypatch):
    """Forcing the off-driver (single-partition executor) solve path must
    give identical fill and accumulation results."""
    import richdem_spark.ops.accum as accum_mod
    import richdem_spark.ops.fill as fill_mod
    from richdem_spark.api import FillDepressions, FlowAccumulation
    from richdem_spark.tiles import raster_from_array

    rng = np.random.default_rng(13)
    dem = rng.integers(0, 50, (24, 24)).astype(np.float64)
    tr = raster_from_array(spark, dem, tile_w=8, tile_h=8)
    golden_fill = FillDepressions(tr).to_array()
    golden_acc = FlowAccumulation(
        FillDepressions(tr), "D8").to_array()
    monkeypatch.setattr(fill_mod, "DRIVER_SOLVE_MAX_PERIM", 0)
    monkeypatch.setattr(accum_mod, "DRIVER_SOLVE_MAX_PERIM", 0)
    got_fill = FillDepressions(tr).to_array()
    assert np.array_equal(got_fill, golden_fill)
    got_acc = FlowAccumulation(FillDepressions(tr), "D8").to_array()
    assert np.array_equal(got_acc, golden_acc)


def test_fill_nodata_dense_label_namespace(spark):
    """NoData-dense tiles mint one terminal label per NoData-adjacent
    drain root — the per-tile label namespace must hold them without
    cross-tile collisions (stride regression test)."""
    from richdem_spark.api import FillDepressions
    from richdem_spark.kernels.fill import priority_flood_fill_pq
    from richdem_spark.tiles import raster_from_array

    rng = np.random.default_rng(5150)
    dem = rng.integers(0, 30, (40, 44)).astype(np.float64)
    dem[rng.random(dem.shape) < 0.35] = -9.0
    golden = priority_flood_fill_pq(dem, -9.0)
    for tw, th in ((8, 8), (13, 11)):
        tr = raster_from_array(spark, dem, tile_w=tw, tile_h=th,
                               nodata=-9.0)
        assert np.array_equal(FillDepressions(tr).to_array(), golden), \
            (tw, th)


def test_convergence_telemetry(spark):
    """MFD and breach expose rounds / in-flight counts so production
    runs can observe seam-iteration convergence."""
    import numpy as np

    from richdem_spark.api import BreachDepressions, FlowAccumulation
    from richdem_spark.tiles import raster_from_array

    rng = np.random.default_rng(4)
    dem = rng.random((24, 24)) * 5 + np.arange(24)[None, :]
    tr = raster_from_array(spark, dem, tile_w=8, tile_h=8)

    m1: dict = {}
    FlowAccumulation(tr, "Quinn", metrics=m1).df.count()
    assert m1["rounds"] >= 0
    assert all(n > 0 for n in m1["inflight_per_round"])

    m2: dict = {}
    BreachDepressions(tr, metrics=m2).df.count()
    assert m2["carve_rounds"] >= 1
    assert len(m2["carve_live_per_round"]) == m2["carve_rounds"]
    assert m2["carve_live_per_round"][-1] == 0


def test_driver_edges_equal_distributed_edges(spark):
    """The driver-side label-graph build (fill's below-threshold fast
    path) must produce exactly the distributed edge pipeline's
    (a, b) -> min(z) graph on random DEMs, ragged tilings, and NoData
    holes."""
    import numpy as np
    from pyspark.sql import functions as F

    import richdem_spark.ops.fill as fm
    from richdem_spark.tiles import raster_from_array

    rng = np.random.default_rng(21)
    for trial, (h, w, tw, th, nd) in enumerate([
        (24, 24, 8, 8, None),
        (30, 22, 7, 9, None),
        (26, 26, 8, 8, -9999.0),
    ]):
        dem = np.round(rng.random((h, w)) * 20) / 2.0
        if nd is not None:
            dem[10:16, 9:14] = nd
        tr = raster_from_array(spark, dem, tw, th, nodata=nd)
        r1 = tr.df.mapInPandas(
            fm._round1(tr.meta, "D8", None), fm._R1_SCHEMA).persist()

        drv = fm._driver_edges(r1.select(*fm._PERIM_COLS).collect(),
                               "D8")
        # reduce driver edges to (a,b)->min(z) for comparison
        red = {}
        for a, b, z in drv:
            k = (min(a, b), max(a, b))
            red[k] = min(red.get(k, np.inf), z)

        in_tile = r1.select(
            F.explode(F.arrays_zip("edge_a", "edge_b", "edge_z"))
            .alias("e")
        ).select(F.col("e.edge_a").alias("a"),
                 F.col("e.edge_b").alias("b"),
                 F.col("e.edge_z").alias("z"))
        dist = (in_tile.unionByName(
                    fm._seam_edges_df(r1, tr.meta, "D8"))
                .groupBy("a", "b").agg(F.min("z").alias("z"))).collect()
        dist_red = {}
        for r in dist:
            k = (min(r.a, r.b), max(r.a, r.b))
            dist_red[k] = min(dist_red.get(k, np.inf), r.z)
        assert red == dist_red, f"trial {trial}: edge graphs differ"
        r1.unpersist()
