"""Flow-metric kernel properties (the reference lacks per-method golden
files; tests assert the documented invariants + cross-method consistency,
mirroring tests/tests.cpp + fsm_tests.cpp property style)."""

import numpy as np
import pytest

from richdem_spark.constants import HAS_FLOW_GEN, NO_DATA_GEN
from richdem_spark.kernels.d8 import d8_flow_accum, d8_flow_directions
from richdem_spark.kernels.fill import priority_flood_fill_epsilon
from richdem_spark.kernels.flowmet import (
    dinf_flow_directions,
    fm_fairfield,
    fm_freeman,
    fm_holmgren,
    fm_ocallaghan,
    fm_quinn,
    fm_tarboton,
    prop_flow_accum,
)
from richdem_spark.kernels.perlin import generate_perlin_terrain


def _dem(seed=3, n=40):
    rng = np.random.default_rng(seed)
    return priority_flood_fill_epsilon(
        rng.normal(50, 10, (n, n)).round(2)
    )


@pytest.mark.parametrize(
    "fm",
    [fm_ocallaghan, fm_quinn, fm_holmgren, fm_freeman, fm_fairfield,
     fm_tarboton],
)
def test_props_sum_to_one(fm):
    dem = _dem()
    props = fm(dem)
    flow = props[..., 0] == HAS_FLOW_GEN
    # unset slots keep the reference's NO_FLOW_GEN marker (-1) in SFD
    # methods (props.setAll, OCallaghan1984.hpp:28); only positive slots
    # carry proportions
    pos = np.clip(props[..., 1:][flow], 0, None)
    sums = pos.sum(axis=-1)
    assert np.allclose(sums, 1.0, atol=1e-6)


@pytest.mark.parametrize(
    "fm",
    [fm_ocallaghan, fm_quinn, fm_freeman, fm_tarboton],
)
def test_mass_conservation(fm):
    """Interior flow eventually reaches the DEM edge: total accumulation
    on edge cells' outflow == number of data cells routed there."""
    dem = _dem(7, 30)
    props = fm(dem)
    acc = prop_flow_accum(props)
    assert acc.min() >= 1.0
    # every data cell contributes exactly once somewhere
    assert acc.max() <= dem.size


def test_generic_accum_matches_d8_accum():
    """prop_flow_accum on a props tensor built from D8 directions must
    equal the (golden-tested) d8_flow_accum exactly — the two
    accumulation kernels share semantics when routing is identical."""
    dem = _dem(11, 25)
    dirs = d8_flow_directions(dem)
    h, w = dirs.shape
    props = np.full((h, w, 9), -1.0, dtype=np.float32)
    for n in range(1, 9):
        m = dirs == n
        props[m, 0] = HAS_FLOW_GEN
        props[m, n] = 1.0
    acc_props = prop_flow_accum(props)
    acc_dirs = d8_flow_accum(dirs)
    assert np.array_equal(acc_props, acc_dirs)


def test_dinf_angles_range_and_nodata():
    dem = _dem(13, 20)
    ang = dinf_flow_directions(dem)
    assert (ang >= 0).all() and (ang < 2 * np.pi + 1e-9).all()
    d2 = dem.copy()
    d2[5, 5] = -9999.0
    ang2 = dinf_flow_directions(d2, nodata=-9999.0)
    assert ang2[5, 5] == -1.0


def test_fairfield_deterministic_and_tiling_invariant():
    dem = _dem(17, 24)
    a = fm_fairfield(dem, seed=5, global_w=24)
    b = fm_fairfield(dem, seed=5, global_w=24)
    assert np.array_equal(a, b)
    # window carved from the same global grid gives identical cell RNG
    sub = fm_fairfield(dem[4:, 6:], seed=5, y0=4, x0=6, global_w=24)
    inner = np.s_[1:-1, 1:-1]
    # compare interiors of the window (edge rows of the sub-array are
    # edge cells there, but interior in the full grid)
    assert np.array_equal(a[5:-1, 7:-1], sub[1:-1, 1:-1])


def test_perlin_reference_permutation():
    t = generate_perlin_terrain(64)
    assert t.shape == (64, 64)
    assert (t >= 0).all() and (t <= 1).all()
    # windowed generation is cell-exact (tiles independent of chopping)
    win = generate_perlin_terrain(64, y0=16, x0=8, h=20, w=30)
    assert np.array_equal(win, t[16:36, 8:38])
    # seeded variant deterministic
    s1 = generate_perlin_terrain(32, seed=9)
    s2 = generate_perlin_terrain(32, seed=9)
    assert np.array_equal(s1, s2)
    assert not np.array_equal(s1, generate_perlin_terrain(32, seed=10))


def test_d4_flow_metrics():
    """FM_D4 / FM_Rho4 (OCallaghan1984.hpp:89-92, Fairfield1991.hpp:
    93-96): cardinal-only flow, Rho4 scales N/S stochastically but still
    always drains downhill."""
    import numpy as np
    from richdem_spark.kernels.flowmet import fm_fairfield, fm_ocallaghan

    rng = np.random.default_rng(3)
    e = priority_flood_fill_epsilon(rng.normal(10, 3, (16, 16)))
    for props in (fm_ocallaghan(e, topology="D4"),
                  fm_fairfield(e, topology="D4", seed=1)):
        # diagonals never receive flow
        assert (props[..., [2, 4, 6, 8]] == 0).all() or (
            props[..., [2, 4, 6, 8]] <= 0).all()
        # interior flowing cells drain strictly downhill
        from richdem_spark.constants import D8X, D8Y
        h, w = e.shape
        for n in (1, 3, 5, 7):
            m = props[..., n] > 0
            ys, xs = np.nonzero(m)
            for y, x in zip(ys, xs):
                assert e[y + D8Y[n], x + D8X[n]] < e[y, x]


def test_d4_accumulation_methods(spark):
    """FA_D4 / FA_Rho4 through the distributed pipeline."""
    import numpy as np
    from richdem_spark.api import FillDepressions, FlowAccumulation
    from richdem_spark.tiles import raster_from_array

    rng = np.random.default_rng(4)
    dem = rng.standard_normal((24, 24)).cumsum(0).cumsum(1)
    tr = raster_from_array(spark, dem, tile_w=8, tile_h=8)
    filled = FillDepressions(tr)
    for method in ("D4", "OCallaghanD4", "Rho4", "FairfieldLeymarieD4"):
        acc = FlowAccumulation(filled, method).to_array()
        assert acc.max() >= 1.0, method
