"""Flat-resolution kernel + operator tests (reference: Barnes 2014a;
property-based since the reference ships no flats golden files —
correctness criterion is the algorithm's own post-condition: every
drainable flat cell gets a flow direction)."""

import numpy as np

from richdem_spark.kernels.d8 import d8_flow_accum, d8_flow_directions
from richdem_spark.kernels.fill import priority_flood_fill
from richdem_spark.kernels.flats import (
    d8_flow_flats,
    find_flat_edges,
    label_flats,
    resolve_flats,
    resolve_flats_pipeline,
)


def test_flat_edges_and_labels():
    p = np.full((9, 12), 5.0)
    p[:, -1] = 1.0
    dirs = d8_flow_directions(p)
    low, high = find_flat_edges(p, dirs)
    assert low.any()
    labels = label_flats(p, low)
    # the single plateau is one component
    assert len(np.unique(labels[labels > 0])) == 1


def test_resolved_flats_drain_everywhere():
    rng = np.random.default_rng(4)
    for trial in range(3):
        dem = priority_flood_fill(
            rng.integers(0, 15, (25, 25)).astype(np.float64)
        )
        dirs, _ = resolve_flats_pipeline(dem)
        assert (dirs[1:-1, 1:-1] != 0).all(), trial
        acc = d8_flow_accum(dirs)
        assert acc.min() >= 1.0
        assert acc.sum() >= dem.size  # all mass routed


def test_alter_dem_variant_matches_flow_flats_drainage():
    rng = np.random.default_rng(9)
    dem = priority_flood_fill(
        rng.integers(0, 10, (20, 20)).astype(np.float64)
    )
    dirs_a, _ = resolve_flats_pipeline(dem, alter=True)
    assert (dirs_a[1:-1, 1:-1] != 0).all()


def test_gradient_superposition_properties():
    """A walled plateau draining through one breach: increments must
    decrease toward the breach along the drainage direction."""
    p = np.full((9, 14), 9.0)
    p[3:6, 2:11] = 5.0  # interior plateau
    p[4, 11] = 1.0      # breach on the right
    p[4, 10] = 5.0
    dirs = d8_flow_directions(p)
    mask, labels = resolve_flats(p, dirs)
    row = mask[4, 2:11]
    assert (row > 0).all()
    # moving right toward the breach, increments never increase
    assert (np.diff(row.astype(np.int64)) <= 0).all()


def test_resolve_flats_operator_distributed(spark):
    """The fully distributed flat resolution (global flat labelling via
    seam union-find + cross-tile BFS relaxation) equals the single-grid
    pipeline cell-for-cell — including ragged tilings."""
    from richdem_spark.api import FillDepressions, ResolveFlats
    from richdem_spark.tiles import raster_from_array

    for seed, tw, th, shape in [(21, 8, 8, (24, 26)),
                                (33, 5, 7, (20, 30))]:
        rng = np.random.default_rng(seed)
        dem = rng.integers(0, 12, shape).astype(np.float64)
        golden = priority_flood_fill(dem)
        tr = raster_from_array(spark, dem, tile_w=tw, tile_h=th)
        dirs = ResolveFlats(FillDepressions(tr)).to_array()
        oracle_dirs, _ = resolve_flats_pipeline(golden)
        assert np.array_equal(dirs, oracle_dirs), (seed, shape)


def test_resolved_flats_route_accumulation(spark):
    """End-to-end: fill -> distributed flat resolution -> accumulation;
    all mass must reach the DEM edge (no NO_FLOW sinks remain)."""
    from richdem_spark.api import (
        FillDepressions,
        FlowAccumulationFromDirs,
        ResolveFlats,
    )
    from richdem_spark.tiles import raster_from_array

    rng = np.random.default_rng(3)
    dem = rng.integers(0, 8, (30, 30)).astype(np.float64)
    tr = raster_from_array(spark, dem, tile_w=10, tile_h=10)
    dirs = ResolveFlats(FillDepressions(tr))
    assert (dirs.to_array()[1:-1, 1:-1] != 0).all()
    acc = FlowAccumulationFromDirs(dirs).to_array()
    assert acc.min() >= 1.0


def test_multi_tile_epsilon_fill_drains(spark):
    """FillDepressions(epsilon=True) across tiles: every interior cell
    must have a defined D8 direction (the reference's own correctness
    criterion for epsilon fills, Barnes2014.hpp:326-331) — exact across
    seams via the distributed flats gradients."""
    from richdem_spark.api import FillDepressions, FlowDirectionsD8
    from richdem_spark.tiles import raster_from_array

    rng = np.random.default_rng(12)
    dem = rng.integers(0, 6, (40, 40)).astype(np.float64)
    tr = raster_from_array(spark, dem, tile_w=13, tile_h=11)
    eps = FillDepressions(tr, epsilon=True)
    d = FlowDirectionsD8(eps).to_array()
    assert (d[1:-1, 1:-1] != 0).all()
    assert (eps.to_array() >= dem).all()
