"""Watershed-scale smoke test (the Beauford analogue,
tests/beauford/README.md:8-11 + tests/tests.cpp:357-373: fill the DEM,
run every flow-accumulation method, assert sanity — the reference's own
"no crash on a real watershed" gate; the Beauford blob itself is
stripped from this copy of the reference, so a seeded Perlin DEM at the
same scale stands in).  Runs only with --runslow."""

import numpy as np
import pytest

from richdem_spark.tiles import raster_from_array

pytestmark = pytest.mark.slow

H, W = 1636, 2418          # Beauford dimensions: 3,955,848 cells
TILE = 512


@pytest.fixture(scope="module")
def dem_tr(spark):
    from richdem_spark.kernels.perlin import generate_perlin_terrain

    # deterministic watershed-scale DEM (same generator as the
    # reference's terrain_generation, seeded)
    arr = generate_perlin_terrain(W, 67, h=H, w=W) * 100.0
    return raster_from_array(spark, np.ascontiguousarray(arr),
                             tile_w=TILE, tile_h=TILE)


def test_fill_and_all_accum_methods(spark, dem_tr):
    from richdem_spark.api import FillDepressions, FlowAccumulation

    filled = FillDepressions(dem_tr).persist()
    fa = filled.to_array()
    dem = dem_tr.to_array()
    assert fa.shape == (H, W)
    assert (fa >= dem).all()

    methods = ["D8", "OCallaghanD8", "Rho8", "FairfieldLeymarieD8",
               "D4", "OCallaghanD4", "Rho4", "FairfieldLeymarieD4",
               "Quinn", "Holmgren", "Freeman", "Tarboton", "Dinfinity"]
    n_cells = H * W
    for m in methods:
        kw = {"exponent": 1.5} if m == "Holmgren" else {}
        acc = FlowAccumulation(filled, method=m, **kw)
        s = acc.df.count()
        assert s > 0, m
        arr = acc.to_array()
        assert np.isfinite(arr[arr > -1]).all(), m
        assert arr.max() >= 1.0, m
        # mass sanity: every cell contributes at least itself
        assert arr.max() <= n_cells + 1, m


def test_dephier_fsm_end_to_end(spark, dem_tr):
    from richdem_spark.api import FillSpillMerge, GetDepressionHierarchy

    deps, labels, flowdirs = GetDepressionHierarchy(dem_tr)
    assert len(deps) >= 1
    assert labels.to_array().shape == (H, W)

    wtd = raster_from_array(
        spark, np.full((H, W), 0.01), tile_w=TILE, tile_h=TILE)
    out = FillSpillMerge(dem_tr, wtd).to_array()
    assert out.shape == (H, W)
    assert (out >= 0).all()
    # mass conservation within tolerance: water either stands or
    # drained to the ocean; standing water cannot exceed what was poured
    assert out.sum() <= 0.01 * H * W + 1e-6
