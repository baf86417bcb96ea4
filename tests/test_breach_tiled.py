"""Tiled breaching tests (round 3): the distributed operator must equal
the serial drainage-tree twin at every tiling, reproduce all 7 reference
goldens multi-tile, and produce a drainage-complete surface."""

import numpy as np
import pytest

from richdem_spark.kernels.ascii_io import read_ascii_grid
from richdem_spark.kernels.breach import (
    CONSTRAINED,
    SELECTIVE,
    breach_drainage_tree,
)
from richdem_spark.tiles import raster_from_array

REF = "/root/reference/tests/breaching"


@pytest.fixture(scope="module")
def dem():
    d, meta = read_ascii_grid(f"{REF}/testdem1.dem")
    return d, meta["nodata_value"]


GOLDEN_CASES = [
    ("complete", dict(mode="complete")),
    ("selective-len2-depth9999",
     dict(mode=SELECTIVE, max_path_len=2, max_depth=9999)),
    ("selective-len4-depth9999",
     dict(mode=SELECTIVE, max_path_len=4, max_depth=9999)),
    ("selective-len4-depth2",
     dict(mode=SELECTIVE, max_path_len=4, max_depth=2)),
    ("selective-len4-depth2-filldep",
     dict(mode=SELECTIVE, fill=True, max_path_len=4, max_depth=2)),
    ("selective-len4-depth8",
     dict(mode=SELECTIVE, max_path_len=4, max_depth=8)),
    ("constrained-len4-depth3",
     dict(mode=CONSTRAINED, max_path_len=4, max_depth=3)),
]


@pytest.mark.parametrize("name,kw", GOLDEN_CASES)
def test_goldens_multi_tile(spark, dem, name, kw):
    """All 7 reference goldens, exact, at a non-trivial tiling
    (VERDICT r2 'Next round #2' done-criterion)."""
    from richdem_spark.api import BreachDepressions

    d, nd = dem
    g, _ = read_ascii_grid(f"{REF}/testdem1.{name}.out")
    tr = raster_from_array(spark, d, tile_w=4, tile_h=4, nodata=nd)
    got = BreachDepressions(tr, **kw).to_array()
    assert np.array_equal(got, g), f"{name} at tiling (4,4)"


@pytest.mark.parametrize("name,kw", [GOLDEN_CASES[0], GOLDEN_CASES[4],
                                     GOLDEN_CASES[6]])
def test_goldens_second_tiling(spark, dem, name, kw):
    """Representative goldens at a second, ragged tiling."""
    from richdem_spark.api import BreachDepressions

    d, nd = dem
    g, _ = read_ascii_grid(f"{REF}/testdem1.{name}.out")
    tr = raster_from_array(spark, d, tile_w=3, tile_h=5, nodata=nd)
    got = BreachDepressions(tr, **kw).to_array()
    assert np.array_equal(got, g), f"{name} at tiling (3,5)"


_MODE_CASES = [
    (dict(mode="complete"),
     dict(mode="complete")),
    (dict(mode="complete", epsilon=True),
     dict(mode="complete", eps_gradients=True)),
    (dict(mode=SELECTIVE, max_path_len=5, max_depth=3.0),
     dict(mode=SELECTIVE, max_path_len=5, max_depth=3.0)),
    (dict(mode=CONSTRAINED, max_path_len=4, max_depth=2.0),
     dict(mode=CONSTRAINED, max_path_len=4, max_depth=2.0)),
    (dict(mode=SELECTIVE, fill=True, max_path_len=5, max_depth=3.0),
     dict(mode=SELECTIVE, fill_depressions=True, max_path_len=5,
          max_depth=3.0)),
]


@pytest.mark.parametrize("i", range(len(_MODE_CASES)))
def test_matches_serial_twin_random(spark, i):
    """Distributed == serial drainage-tree twin, cell-for-cell, on a
    random integer DEM (heavy ties) for every mode combination."""
    from richdem_spark.api import BreachDepressions

    api_kw, ser_kw = _MODE_CASES[i]
    rng = np.random.default_rng(42)
    d = rng.integers(0, 10, (15, 17)).astype(np.float64)
    tr = raster_from_array(spark, d, tile_w=5, tile_h=5)
    want = breach_drainage_tree(d, None, **ser_kw)
    got = BreachDepressions(tr, **api_kw).to_array()
    assert np.array_equal(got, want), api_kw


def test_matches_serial_twin_ragged_tiling(spark):
    """Same equality at a ragged 1-row-of-tiles tiling."""
    from richdem_spark.api import BreachDepressions

    rng = np.random.default_rng(58)
    d = rng.integers(0, 10, (15, 17)).astype(np.float64)
    tr = raster_from_array(spark, d, tile_w=16, tile_h=3)
    for api_kw, ser_kw in (_MODE_CASES[0], _MODE_CASES[4]):
        want = breach_drainage_tree(d, None, **ser_kw)
        got = BreachDepressions(tr, **api_kw).to_array()
        assert np.array_equal(got, want), api_kw


def test_matches_static_kernel_nodata(spark):
    """Interior NoData blocks drain the flood (seam-crossing seeds)."""
    from richdem_spark.api import BreachDepressions

    rng = np.random.default_rng(9)
    d = rng.integers(1, 9, (12, 12)).astype(np.float64)
    d[5:7, 5:8] = -1.0  # interior nodata block
    want = breach_drainage_tree(d, -1.0, "complete")
    tr = raster_from_array(spark, d, tile_w=5, tile_h=4, nodata=-1.0)
    got = BreachDepressions(tr, mode="complete").to_array()
    assert np.array_equal(got, want)


def test_drainage_property_multi_tile(spark):
    """After complete breaching with epsilon gradients every interior
    cell has a strictly lower neighbour (the breach guarantee),
    regardless of tiling."""
    from richdem_spark.api import BreachDepressions
    from richdem_spark.kernels.d8 import d8_flow_directions

    rng = np.random.default_rng(5)
    d = rng.integers(0, 60, (30, 30)).astype(np.float64)
    tr = raster_from_array(spark, d, tile_w=8, tile_h=8)
    out = BreachDepressions(tr, mode="complete", epsilon=True).to_array()
    dirs = d8_flow_directions(out)
    assert (dirs[1:-1, 1:-1] != 0).all()


def test_cross_parallelism_identical(spark):
    """The reference MPI-harness criterion: identical outputs at any
    partitioning of the same input."""
    from richdem_spark.api import BreachDepressions

    rng = np.random.default_rng(3)
    d = rng.integers(0, 12, (14, 14)).astype(np.float64)
    outs = []
    for tile in [(14, 14), (7, 7), (3, 14)]:
        tr = raster_from_array(spark, d, tile_w=tile[0], tile_h=tile[1])
        outs.append(BreachDepressions(tr, mode="complete").to_array())
    assert np.array_equal(outs[0], outs[1])
    assert np.array_equal(outs[0], outs[2])
