"""Golden-file kernel tests mirroring the reference's doctest harness
(/root/reference/tests/tests.cpp:135-146, 233-289)."""

import glob
import os

import numpy as np
import pytest

from richdem_spark.kernels.ascii_io import read_ascii_grid
from richdem_spark.kernels.d8 import (
    d8_flow_accum,
    d8_flow_directions,
    exit_cell_of,
)
from richdem_spark.kernels.fill import (
    fill_tile_labels,
    graph_priority_flood,
    priority_flood_fill,
    priority_flood_fill_epsilon,
)
from richdem_spark.constants import GRID_ALL

REF = "/root/reference/tests"


def _pairs(pattern):
    out = []
    for d8f in sorted(glob.glob(os.path.join(REF, "flow_accum", pattern))):
        outf = d8f[:-3] + ".out"
        if os.path.exists(outf):
            out.append((d8f, outf))
    return out


@pytest.mark.parametrize(
    "d8f,outf", _pairs("testdem*.d8") + _pairs("test_*.d8")
)
def test_d8_flow_accum_goldens(d8f, outf):
    """Every reference .d8 -> .out accumulation pair must match exactly
    (tests/tests.cpp:135-146)."""
    dirs, meta = read_ascii_grid(d8f, dtype=np.float64)
    nodata = meta["nodata_value"]
    d = dirs.astype(np.int64)
    d[dirs == nodata] = 255
    expected, _ = read_ascii_grid(outf, dtype=np.float64)
    got = d8_flow_accum(d.astype(np.uint8))
    assert np.array_equal(got, expected), f"{d8f} mismatch"


def test_fill_depressions_golden():
    dem, meta = read_ascii_grid(f"{REF}/depressions/testdem1.dem")
    expected, _ = read_ascii_grid(f"{REF}/depressions/testdem1.all.out")
    got = priority_flood_fill(dem, nodata=meta["nodata_value"])
    assert np.array_equal(got, expected)


def test_fill_properties_random():
    rng = np.random.default_rng(42)
    for _ in range(5):
        h, w = rng.integers(10, 30, 2)
        dem = rng.integers(0, 100, (h, w)).astype(np.float64)
        filled = priority_flood_fill(dem)
        assert (filled >= dem).all()
        # idempotent
        assert np.array_equal(priority_flood_fill(filled), filled)
        # epsilon fill: every cell has a strictly-lower D8 path to the edge
        eps = priority_flood_fill_epsilon(dem)
        dirs = d8_flow_directions(eps)
        interior_noflow = (dirs[1:-1, 1:-1] == 0).sum()
        assert interior_noflow == 0


def test_tiled_fill_matches_single_grid():
    """Two-round tile fill == single-grid fill (the Barnes2016 invariant,
    mirroring programs/parallel_priority_flood/test.py)."""
    rng = np.random.default_rng(7)
    for trial in range(4):
        h = w = int(rng.integers(20, 40))
        dem = rng.integers(0, 50, (h, w)).astype(np.float64)
        golden = priority_flood_fill(dem)

        ty = tx = 2
        th, tw = (h + ty - 1) // ty, (w + tx - 1) // tx
        tiles = {}
        all_edges = []
        base = 2
        for gy in range(ty):
            for gx in range(tx):
                sub = dem[gy * th : (gy + 1) * th, gx * tw : (gx + 1) * tw]
                if sub.size == 0:
                    continue
                mask = 0
                from richdem_spark.constants import (
                    GRID_BOTTOM, GRID_LEFT, GRID_RIGHT, GRID_TOP,
                )
                if gx == 0:
                    mask |= GRID_LEFT
                if gy == 0:
                    mask |= GRID_TOP
                if gx == tx - 1 or (gx + 1) * tw >= w:
                    mask |= GRID_RIGHT
                if gy == ty - 1 or (gy + 1) * th >= h:
                    mask |= GRID_BOTTOM
                filled, labels, edges = fill_tile_labels(sub, None, mask, base)
                base += sub.size + 2
                tiles[(gy, gx)] = (filled, labels, gy * th, gx * tw)
                all_edges.extend((a, b, z) for (a, b), z in edges.items())

        # cross-tile adjacency: connect labels of touching perimeter cells
        # (HandleEdge/HandleCorner, parallel_priority_flood/main.cpp:344-398)
        glabels = np.zeros((h, w), dtype=np.int64)
        gfilled = np.zeros((h, w))
        for (gy, gx), (filled, labels, oy, ox) in tiles.items():
            sh, sw = filled.shape
            glabels[oy : oy + sh, ox : ox + sw] = labels
            gfilled[oy : oy + sh, ox : ox + sw] = filled
        seams = set()
        for (gy, gx), (filled, labels, oy, ox) in tiles.items():
            sh, sw = filled.shape
            for yy, xx in [(oy + sh, None), (None, ox + sw)]:
                pass
        # simpler: scan every horizontally/vertically/diagonally adjacent
        # cell pair that straddles a tile boundary
        cut_ys = {gy * th for gy in range(1, ty) if gy * th < h}
        cut_xs = {gx * tw for gx in range(1, tx) if gx * tw < w}
        pairs = []
        for y0 in cut_ys:
            for x in range(w):
                for dx in (-1, 0, 1):
                    if 0 <= x + dx < w:
                        pairs.append(((y0 - 1, x), (y0, x + dx)))
        for x0 in cut_xs:
            for y in range(h):
                for dy in (-1, 0, 1):
                    if 0 <= y + dy < h:
                        pairs.append(((y, x0 - 1), (y + dy, x0)))
        for (y1, x1), (y2, x2) in pairs:
            la, lb = int(glabels[y1, x1]), int(glabels[y2, x2])
            z = max(gfilled[y1, x1], gfilled[y2, x2])
            if la != lb:
                all_edges.append((la, lb, z))

        graph_elev = graph_priority_flood(all_edges)
        out = gfilled.copy()
        for lbl, z in graph_elev.items():
            if lbl > 1 and z != -np.inf:
                m = glabels == lbl
                out[m] = np.maximum(out[m], z)
        assert np.array_equal(out, golden), f"trial {trial}"


def test_exit_cell_pointer_doubling():
    dem = np.array(
        [[5, 5, 5, 5], [5, 1, 2, 5], [5, 3, 2, 5], [5, 5, 5, 5]],
        dtype=np.float64,
    )
    filled = priority_flood_fill_epsilon(dem)
    dirs = d8_flow_directions(filled)
    ex = exit_cell_of(dirs)
    h, w = dem.shape
    # every cell's exit must itself have a flowdir pointing off-grid or be
    # a terminal
    for i in range(h * w):
        e = ex[i]
        assert e >= 0
        # exits are on the border (their dirs point off-grid) for a fully
        # drained DEM
        y, x = divmod(e, w)
        assert y in (0, h - 1) or x in (0, w - 1)


def test_max_dep_fill_goldens():
    """PriorityFlood_Barnes2014_max_dep vs the reference goldens
    (tests/tests.cpp:275-289, testdem1.{1,2}.out)."""
    from richdem_spark.kernels.fill import priority_flood_max_dep

    dem, _ = read_ascii_grid(f"{REF}/depressions/testdem1.dem")
    for k in (1, 2):
        exp, _ = read_ascii_grid(f"{REF}/depressions/testdem1.{k}.out")
        assert np.array_equal(priority_flood_max_dep(dem, k), exp), k
    # huge limit == plain fill except cells AT the rim (strict <): the
    # filled surface must still dominate the max_dep-filled one
    full = priority_flood_fill(dem, nodata=None)
    got = priority_flood_max_dep(dem, dem.size)
    assert (got <= full).all() and (got >= dem).all()


def test_d8_loop_residual_and_taudem():
    import numpy as np

    from richdem_spark.kernels.d8 import d8_loop_residual, taudem_to_d8

    dirs = np.zeros((5, 5), dtype=np.uint8)
    assert d8_loop_residual(dirs) == 0
    # 2-cycle; a cell draining INTO it still drains (out-degree <= 1
    # means nothing is strictly downstream of a cycle), so the residual
    # is exactly the two cycle cells
    dirs[2, 1], dirs[2, 2] = 5, 1
    dirs[2, 0] = 5
    assert d8_loop_residual(dirs) == 2
    dirs[2, 0] = 255
    assert d8_loop_residual(dirs) == 2

    t = np.arange(9, dtype=float).reshape(3, 3)
    np.testing.assert_array_equal(
        taudem_to_d8(t),
        np.array([[0, 5, 4], [3, 2, 1], [8, 7, 6]], dtype=np.uint8))
    import pytest as _pt

    with _pt.raises(ValueError, match="invalid TauDEM"):
        taudem_to_d8(np.array([[42.0]]))
