"""Depression hierarchy + fill-spill-merge property tests, mirroring the
reference's own strategy (tests/fsm_tests.cpp:467-527, 638, 687):
FSM with overwhelming water == Priority-Flood fill; repetition is
idempotent; water is conserved."""

import numpy as np
import pytest

from richdem_spark.kernels.dephier import (
    NO_VALUE,
    OCEAN,
    Depression,
    get_depression_hierarchy,
    last_layer,
)
from richdem_spark.kernels.fill import priority_flood_fill
from richdem_spark.kernels.fsm import fill_spill_merge, overflow


def _ocean_border_labels(h, w):
    lab = np.full((h, w), -1, dtype=np.int64)
    lab[0, :] = OCEAN
    lab[-1, :] = OCEAN
    lab[:, 0] = OCEAN
    lab[:, -1] = OCEAN
    return lab


def _random_terrain(seed, lo=10, hi=30):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(lo, hi))
    dem = rng.integers(0, 100, (n, n)).astype(np.float64)
    # border forced to ocean level (fsm_tests.cpp:474-527 pattern)
    dem[0, :] = 0
    dem[-1, :] = 0
    dem[:, 0] = 0
    dem[:, -1] = 0
    return dem


def test_hierarchy_structure():
    dem = np.array([
        [0, 0, 0, 0, 0, 0, 0],
        [0, 9, 9, 9, 9, 9, 0],
        [0, 9, 1, 9, 2, 9, 0],
        [0, 9, 9, 9, 9, 9, 0],
        [0, 0, 0, 0, 0, 0, 0],
    ], dtype=np.float64)
    labels = _ocean_border_labels(*dem.shape)
    deps, lab, flow = get_depression_hierarchy(dem, labels)
    # ocean + 2 pits (+ their merge node, if they merge below the ocean
    # link level)
    pits = [d for d in deps[1:] if d.lchild == NO_VALUE]
    assert len([p for p in pits if p.pit_elev in (1.0, 2.0)]) == 2
    # volumes: the two 1-cell pits under outlet 9 hold 8 and 7 units
    vols = sorted(
        d.dep_vol for d in deps[1:] if d.pit_elev in (1.0, 2.0)
    )
    # out_elev for each pit is where it meets the other or the ocean
    assert all(v > 0 for v in vols)
    # labels partition land cells
    assert (lab[dem == 1] > 0).all() and (lab[dem == 2] > 0).all()


def test_hierarchy_volumes_match_fill():
    """Sum of top-level depression volumes == volume added by the
    priority-flood fill (same water, two derivations)."""
    for seed in range(5):
        dem = _random_terrain(seed)
        h, w = dem.shape
        labels = _ocean_border_labels(h, w)
        deps, lab, flow = get_depression_hierarchy(dem, labels)
        filled = priority_flood_fill(dem)
        fill_volume = (filled - dem).sum()
        top_vol = sum(
            deps[d].dep_vol for d in range(1, len(deps))
            if deps[d].ocean_parent or deps[d].parent == NO_VALUE
        )
        assert top_vol == pytest.approx(fill_volume, rel=1e-9), seed


def test_fsm_lots_of_water_equals_fill():
    """fsm_tests.cpp:467-471: FSM with enormous surface water must equal
    the priority-flood fill."""
    for seed in range(6):
        dem = _random_terrain(seed + 100)
        h, w = dem.shape
        labels = _ocean_border_labels(h, w)
        deps, lab, flow = get_depression_hierarchy(dem, labels)
        wtd = np.full((h, w), 1000.0)
        out = fill_spill_merge(dem, lab, flow, deps, wtd)
        surface = dem + out
        filled = priority_flood_fill(dem)
        assert np.allclose(surface, filled, atol=1e-6), seed


def test_fsm_idempotent():
    """fsm_tests.cpp:474-527: re-running FSM on its own output changes
    nothing (within fp tolerance)."""
    for seed in range(4):
        dem = _random_terrain(seed + 200)
        h, w = dem.shape
        labels = _ocean_border_labels(h, w)
        deps, lab, flow = get_depression_hierarchy(dem, labels)
        wtd = np.full((h, w), 3.0)
        out1 = fill_spill_merge(dem, lab, flow, deps, wtd)
        deps2, lab2, flow2 = get_depression_hierarchy(dem, labels)
        out2 = fill_spill_merge(dem, lab2, flow2, deps2, out1)
        assert np.allclose(out1, out2, atol=1e-6), seed


def test_fsm_mass_conservation_closed_basin():
    """Water poured into an interior basin that cannot reach the ocean is
    fully retained (fsm_tests.cpp:687 spirit)."""
    dem = np.array([
        [0, 0, 0, 0, 0, 0, 0],
        [0, 9, 9, 9, 9, 9, 0],
        [0, 9, 1, 1, 1, 9, 0],
        [0, 9, 1, 1, 1, 9, 0],
        [0, 9, 9, 9, 9, 9, 0],
        [0, 0, 0, 0, 0, 0, 0],
    ], dtype=np.float64)
    h, w = dem.shape
    labels = _ocean_border_labels(h, w)
    deps, lab, flow = get_depression_hierarchy(dem, labels)
    wtd = np.zeros((h, w))
    wtd[3, 3] = 5.0  # pour 5 units into the pit; capacity = 6 cells*(9-1)
    out = fill_spill_merge(dem, lab, flow, deps, wtd)
    assert out.sum() == pytest.approx(5.0, rel=1e-9)
    # level: 5 units over the 6 floor cells at elev 1 -> 1 + 5/6
    level = (dem + out)[out > 0]
    assert np.allclose(level, 1 + 5.0 / 6.0)


def test_last_layer():
    dem = _random_terrain(7)
    labels = _ocean_border_labels(*dem.shape)
    deps, lab, flow = get_depression_hierarchy(dem, labels)
    ll = last_layer(lab, dem, deps)
    assert ll.shape == dem.shape


# --------------------------------------------------------------------------
# distributed depression hierarchy + FSM (ops/dephier.py, ops/fsm.py)
# --------------------------------------------------------------------------


def _tiefree(seed, lo=14, hi=32):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(lo, hi))
    return rng.standard_normal((n, n)).cumsum(0).cumsum(1)


def test_distributed_hierarchy_matches_single_grid(spark):
    """On tie-free DEMs the distributed hierarchy must equal the
    single-grid kernel field-for-field at >=3 tilings (incl. ragged and
    single-tile)."""
    from richdem_spark.ops.dephier import depression_hierarchy
    from richdem_spark.tiles import raster_from_array

    for seed in (1, 2):
        dem = _tiefree(seed)
        n = dem.shape[0]
        labels = _ocean_border_labels(n, n)
        ds, lab_s, flow_s = get_depression_hierarchy(dem, labels)
        for tw, th in ((8, 8), (5, 7), (n, n)):
            tr = raster_from_array(spark, dem, tile_w=tw, tile_h=th)
            dd, lab_d, flow_d = depression_hierarchy(tr)
            assert len(dd) == len(ds), (seed, tw, th)
            for a, b in zip(ds, dd):
                for f in ("parent", "lchild", "rchild", "odep",
                          "geolink", "ocean_parent", "cell_count"):
                    assert getattr(a, f) == getattr(b, f), (seed, tw, f)
                assert np.isclose(a.pit_elev, b.pit_elev)
                assert np.isclose(a.out_elev, b.out_elev) or (
                    np.isinf(a.out_elev) and np.isinf(b.out_elev))
                assert np.isclose(a.dep_vol, b.dep_vol)
            assert np.array_equal(lab_d.to_array(), lab_s), (seed, tw)
            assert np.array_equal(
                flow_d.to_array(), flow_s.astype(np.uint8)), (seed, tw)


def test_distributed_fsm_huge_water_equals_fill(spark):
    from richdem_spark.api import FillSpillMerge
    from richdem_spark.tiles import raster_from_array

    dem = _tiefree(31)
    wtd = np.full(dem.shape, 1e6)
    tr = raster_from_array(spark, dem, tile_w=7, tile_h=9)
    tw = raster_from_array(spark, wtd, tile_w=7, tile_h=9)
    out = FillSpillMerge(tr, tw).to_array()
    assert np.allclose(dem + out, priority_flood_fill(dem), atol=1e-6)


def test_distributed_fsm_matches_single_grid(spark):
    from richdem_spark.api import FillSpillMerge
    from richdem_spark.tiles import raster_from_array

    for seed in (41, 42):
        dem = _tiefree(seed)
        n = dem.shape[0]
        rng = np.random.default_rng(seed + 1000)
        wtd = np.maximum(rng.standard_normal(dem.shape), 0.0) * 2
        labels = _ocean_border_labels(n, n)
        deps, lab, flow = get_depression_hierarchy(dem, labels)
        gold = fill_spill_merge(dem, lab, flow, deps, wtd.copy())
        for tw_, th_ in ((8, 8), (5, 11)):
            tr = raster_from_array(spark, dem, tile_w=tw_, tile_h=th_)
            twr = raster_from_array(spark, wtd, tile_w=tw_, tile_h=th_)
            out = FillSpillMerge(tr, twr).to_array()
            assert np.allclose(out, gold, atol=1e-8), (seed, tw_, th_)


def test_distributed_fsm_conservation(spark):
    from richdem_spark.api import FillSpillMerge
    from richdem_spark.tiles import raster_from_array

    dem = np.array([
        [0, 0, 0, 0, 0, 0, 0],
        [0, 9, 9, 9, 9, 9, 0],
        [0, 9, 1, 1, 1, 9, 0],
        [0, 9, 1, 1, 1, 9, 0],
        [0, 9, 9, 9, 9, 9, 0],
        [0, 0, 0, 0, 0, 0, 0]], dtype=np.float64)
    wtd = np.zeros(dem.shape)
    wtd[3, 3] = 5.0
    tr = raster_from_array(spark, dem, tile_w=3, tile_h=3)
    twr = raster_from_array(spark, wtd, tile_w=3, tile_h=3)
    out = FillSpillMerge(tr, twr).to_array()
    assert out.sum() == pytest.approx(5.0, rel=1e-9)
    assert np.allclose((dem + out)[out > 0], 1 + 5.0 / 6.0)


def test_weighted_accum_zero_mass_paths(spark):
    """Regression: zero-weight perimeter handoffs must not starve the
    cross-tile Kahn solve (falsely reported as a flow loop)."""
    from richdem_spark.api import FlowAccumulationFromDirs
    from richdem_spark.kernels.d8 import d8_flow_accum, d8_flow_directions
    from richdem_spark.kernels.fill import priority_flood_fill_epsilon
    from richdem_spark.tiles import raster_from_array

    rng = np.random.default_rng(77)
    dem = priority_flood_fill_epsilon(
        rng.standard_normal((24, 24)).cumsum(0).cumsum(1))
    dirs = d8_flow_directions(dem)
    w = np.zeros(dem.shape)  # all-zero weights: every handoff is 0 mass
    golden = d8_flow_accum(dirs, weights=w)
    dr = raster_from_array(spark, dirs, tile_w=8, tile_h=8)
    wr = raster_from_array(spark, w, tile_w=8, tile_h=8)
    got = FlowAccumulationFromDirs(dr, weights=wr).to_array()
    assert np.array_equal(got, golden)


def test_distributed_fsm_bucket_refinement(spark, monkeypatch):
    """Forcing the histogram-refinement recursion (collect cap 1) must
    not change the water table."""
    import richdem_spark.ops.fsm as fsm_mod
    from richdem_spark.tiles import raster_from_array

    dem = _tiefree(61, 20, 28)
    rng = np.random.default_rng(62)
    wtd = np.maximum(rng.standard_normal(dem.shape), 0.0) * 2
    tr = raster_from_array(spark, dem, tile_w=9, tile_h=8)
    twr = raster_from_array(spark, wtd, tile_w=9, tile_h=8)
    gold = fsm_mod.fill_spill_merge(tr, twr).to_array()
    monkeypatch.setattr(fsm_mod, "COLLECT_CAP", 1)
    got = fsm_mod.fill_spill_merge(tr, twr).to_array()
    assert np.allclose(got, gold, atol=1e-9)


def test_distributed_hierarchy_custom_ocean(spark):
    """Custom ocean_labels (round-3 gate removal): an interior 'sea'
    region seeds the flood instead of the border; the distributed
    hierarchy equals the single-grid kernel field-for-field at >=2
    tilings."""
    from richdem_spark.api import GetDepressionHierarchy
    from richdem_spark.tiles import raster_from_array

    dem = _tiefree(7)
    n = dem.shape[0]
    # interior ocean: a low block in the middle; border is land
    labels = np.full((n, n), 5, dtype=np.int64)   # non-zero = land
    cy, cx = n // 2, n // 2
    labels[cy - 2:cy + 2, cx - 2:cx + 2] = 0      # OCEAN
    dem[cy - 2:cy + 2, cx - 2:cx + 2] -= 50.0     # make it genuinely low
    ds, lab_s, flow_s = get_depression_hierarchy(dem, labels)
    for tw, th in ((8, 8), (6, 11)):
        tr = raster_from_array(spark, dem, tile_w=tw, tile_h=th)
        lab_tr = raster_from_array(
            spark, labels.astype(np.float64), tile_w=tw, tile_h=th)
        dd, lab_d, flow_d = GetDepressionHierarchy(
            tr, ocean_labels=lab_tr)
        assert len(dd) == len(ds), (tw, th)
        for a, b in zip(ds, dd):
            for f in ("parent", "lchild", "rchild", "odep",
                      "geolink", "ocean_parent", "cell_count"):
                assert getattr(a, f) == getattr(b, f), (tw, th, f)
            assert np.isclose(a.pit_elev, b.pit_elev)
            assert np.isclose(a.dep_vol, b.dep_vol)
        assert np.array_equal(lab_d.to_array(), lab_s), (tw, th)
        assert np.array_equal(
            flow_d.to_array(), flow_s.astype(np.uint8)), (tw, th)
