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


# --------------------------------------------------------------------------
# D-infinity flat resolution (flats/flat_resolution_dinf.hpp)
# --------------------------------------------------------------------------


def _dinf_masked_flowdir_reference(mask, groups, x, y):
    """Per-cell transcription of dinf_masked_FlowDir
    (flat_resolution_dinf.hpp:18-72) — the test oracle."""
    import math

    from richdem_spark.constants import D8X, D8Y
    from richdem_spark.kernels.flowmet import (
        _AC, _AF, _DX_E1, _DX_E2, _DY_E1, _DY_E2, D8_TO_DINF,
    )

    h, w = mask.shape
    smax, nmax, rmax = 0.0, -1, 0.0
    for n in range(8):
        x1, y1 = x + int(_DX_E1[n]), y + int(_DY_E1[n])
        x2, y2 = x + int(_DX_E2[n]), y + int(_DY_E2[n])
        if not (0 <= x1 < w and 0 <= y1 < h
                and 0 <= x2 < w and 0 <= y2 < h):
            continue
        if groups[y1, x1] != groups[y, x] or groups[y2, x2] != groups[y, x]:
            continue
        e0, e1, e2 = float(mask[y, x]), float(mask[y1, x1]), \
            float(mask[y2, x2])
        s1, s2 = e0 - e1, e1 - e2
        r = math.atan2(s2, s1)
        if r < 0:
            r, s = 0.0, s1
        elif r > math.atan2(1, 1):
            r, s = math.atan2(1, 1), (e0 - e2) / math.sqrt(2)
        else:
            s = math.sqrt(s1 * s1 + s2 * s2)
        if s > smax:
            smax, nmax, rmax = s, n, r
    if nmax != -1:
        return _AF[nmax] * rmax + _AC[nmax] * np.pi / 2
    for n in range(1, 9):
        nx, ny = x + int(D8X[n]), y + int(D8Y[n])
        if (0 <= nx < w and 0 <= ny < h
                and groups[ny, nx] == groups[y, x]
                and mask[ny, nx] < mask[y, x]):
            return D8_TO_DINF[n]
    return -1.0


def test_dinf_flow_flats_vs_transcription():
    """Vectorized dinf_flow_flats == the per-cell reference
    transcription on random flat masks."""
    from richdem_spark.kernels.flowmet import dinf_flow_flats

    rng = np.random.default_rng(17)
    for trial in range(6):
        h, w = rng.integers(8, 20, 2)
        mask = rng.integers(0, 5, (h, w)).astype(np.int64)
        groups = rng.integers(1, 4, (h, w)).astype(np.int64)
        angles = np.where(rng.random((h, w)) < 0.6, -1.0, 0.5)
        got = dinf_flow_flats(mask, groups, angles)
        for y in range(1, h - 1):
            for x in range(1, w - 1):
                if angles[y, x] != -1.0 or mask[y, x] == -1:
                    continue
                exp = _dinf_masked_flowdir_reference(mask, groups, x, y)
                assert np.isclose(got[y, x], exp), (trial, y, x)


def test_resolve_flats_dinf_distributed(spark):
    """Distributed ResolveFlatsDinf == the single-grid composition
    (dinf dirs -> resolve_flats -> dinf_flow_flats) at 2 tilings, and
    interior flats with outlets end up resolved."""
    from richdem_spark.api import ResolveFlatsDinf
    from richdem_spark.constants import FLOWDIR_NO_DATA, NO_FLOW
    from richdem_spark.kernels.flats import resolve_flats
    from richdem_spark.kernels.flowmet import (
        dinf_flow_directions, dinf_flow_flats,
    )
    from richdem_spark.tiles import raster_from_array

    rng = np.random.default_rng(23)
    for trial in range(2):
        dem = rng.integers(0, 6, (26, 26)).astype(np.float64)
        dem[8:16, 8:18] = 3.0   # a big flat with outlets
        ang = dinf_flow_directions(dem, no_flow_value=-1.0)
        pseudo = np.where(ang == -1.0, NO_FLOW, 1).astype(np.uint8)
        mask, labels = resolve_flats(dem, pseudo)
        golden = dinf_flow_flats(mask, labels, ang)
        for tw, th in ((9, 7), (13, 13)):
            tr = raster_from_array(spark, dem, tile_w=tw, tile_h=th)
            got = ResolveFlatsDinf(tr).to_array()
            assert np.allclose(got, golden), (
                trial, tw, th, np.argwhere(~np.isclose(got, golden))[:5])
        # resolution actually happened inside the flat
        inner = golden[9:15, 9:17]
        assert (inner != -1.0).any()


def test_alter_dem_distributed_matches_pipeline(spark):
    """ResolveFlats(alter_dem=True), fully distributed, equals the
    single-grid resolve_flats_pipeline elevations cell-for-cell at
    three tilings (round-3 gate removal)."""
    from richdem_spark.api import ResolveFlats
    from richdem_spark.tiles import raster_from_array

    rng = np.random.default_rng(77)
    dem = priority_flood_fill(
        rng.integers(0, 9, (22, 27)).astype(np.float64))
    _, want = resolve_flats_pipeline(dem, alter=True)
    for tw, th in [(8, 8), (5, 9), (22, 4)]:
        tr = raster_from_array(spark, dem, tile_w=tw, tile_h=th)
        got = ResolveFlats(tr, alter_dem=True).to_array()
        assert np.array_equal(got, want), (tw, th)


def test_multi_tile_d4_epsilon_fill(spark):
    """Multi-tile D4 epsilon fill (round-3 gate removal): every interior
    cell must have a strictly lower CARDINAL neighbour (the D4 epsilon
    guarantee, Barnes2014.hpp:424-451), fill levels match the plain D4
    fill to ULP precision, and outputs are identical across tilings."""
    from richdem_spark.api import FillDepressions
    from richdem_spark.constants import TOPO_D4
    from richdem_spark.kernels.fill import priority_flood_fill
    from richdem_spark.tiles import raster_from_array

    rng = np.random.default_rng(8)
    dem = rng.integers(0, 6, (30, 30)).astype(np.float64)
    outs = []
    for tw, th in [(9, 11), (15, 15)]:
        tr = raster_from_array(spark, dem, tile_w=tw, tile_h=th)
        eps = FillDepressions(tr, epsilon=True,
                              topology=TOPO_D4).to_array()
        outs.append(eps)
    assert np.array_equal(outs[0], outs[1])
    eps = outs[0]
    # strictly lower cardinal neighbour everywhere in the interior
    lower = np.zeros_like(eps, dtype=bool)
    lower[1:-1, 1:-1] = (
        (eps[1:-1, 1:-1] > eps[:-2, 1:-1])
        | (eps[1:-1, 1:-1] > eps[2:, 1:-1])
        | (eps[1:-1, 1:-1] > eps[1:-1, :-2])
        | (eps[1:-1, 1:-1] > eps[1:-1, 2:])
    )
    assert lower[1:-1, 1:-1].all()
    plain = priority_flood_fill(dem, topology=TOPO_D4)
    assert (eps >= plain).all()
    # epsilon raises by nextafter chains only (tiny absolute budget even
    # for zero-valued cells, where rtol would be meaningless)
    assert float((eps - plain).max()) <= 1e-9


def test_garbrecht_resolves_flats():
    """Garbrecht 1997 legacy kernel (flats/garbrecht.hpp): after the
    two gradient sweeps every drainable flat cell drains; elevations
    move by exactly (inc1+inc2)*epsilon."""
    import numpy as np

    from richdem_spark.constants import NO_FLOW
    from richdem_spark.kernels.d8 import d8_flow_directions
    from richdem_spark.kernels.fill import priority_flood_fill
    from richdem_spark.kernels.garbrecht import (
        garbrecht_alg,
        gradient_away_from_higher,
        gradient_towards_lower,
    )

    rng = np.random.default_rng(12)
    for _ in range(3):
        dem = np.round(rng.random((20, 20)) * 4)  # coarse: many flats
        filled = priority_flood_fill(dem, nodata=None)
        dirs = d8_flow_directions(filled)
        flats = dirs == NO_FLOW
        if not flats.any():
            continue
        inc1 = gradient_towards_lower(filled, dirs)
        inc2 = gradient_away_from_higher(filled, dirs)
        # gradients live only on flat cells
        assert (inc1[~flats] == 0).all() and (inc2[~flats] == 0).all()
        out, ndirs = garbrecht_alg(filled, dirs)
        # the epsilon combination is exactly the reference formula
        np.testing.assert_allclose(
            out - filled,
            ((inc1 + inc2).astype(np.float32)
             * np.float32(0.001)).astype(np.float64))
        # flats shrink dramatically and the surface only ever rises
        assert (ndirs == NO_FLOW).sum() < flats.sum()
        assert (out >= filled).all()


def test_nextafter_k_matches_iterated_nextafter():
    import numpy as np

    from richdem_spark.kernels.flats import nextafter_k

    rng = np.random.default_rng(11)
    vals = np.concatenate([
        rng.normal(0, 1e3, 200),            # mixed signs
        rng.uniform(0, 1e-300, 50),         # subnormal neighbourhood
        np.array([0.0, -0.0, 1.0, -1.0, 1e308, -1e-308]),
    ])
    ks = rng.integers(0, 5000, vals.size)
    got = nextafter_k(vals, ks)
    exp = vals.astype(np.float64).copy()
    exp[exp == 0.0] = 0.0
    for i in range(exp.size):
        for _ in range(int(ks[i])):
            exp[i] = np.nextafter(exp[i], np.inf)
    np.testing.assert_array_equal(got, exp)
