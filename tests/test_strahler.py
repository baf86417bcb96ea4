"""Strahler stream order: serial-kernel semantics + tiled equivalence."""

import numpy as np
import pytest

from richdem_spark.constants import D8X, D8Y, FLOWDIR_NO_DATA
from richdem_spark.kernels.strahler import strahler_order


def _code(dx, dy):
    return next(i for i in range(1, 9) if D8X[i] == dx and D8Y[i] == dy)


def _brute_strahler(dirs):
    """Reference-free oracle: recursive definition evaluated by
    repeated relaxation until fixpoint (O(n^2) worst case, test only)."""
    h, w = dirs.shape
    order = np.zeros((h, w), np.int64)
    valid = dirs != FLOWDIR_NO_DATA
    # collect inflows per cell
    inflows = {(y, x): [] for y in range(h) for x in range(w)}
    for y in range(h):
        for x in range(w):
            d = int(dirs[y, x])
            if not valid[y, x] or not (1 <= d <= 8):
                continue
            ny, nx = y + D8Y[d], x + D8X[d]
            if 0 <= ny < h and 0 <= nx < w and valid[ny, nx]:
                inflows[(ny, nx)].append((y, x))
    changed = True
    while changed:
        changed = False
        for y in range(h):
            for x in range(w):
                if not valid[y, x]:
                    continue
                ins = [order[c] for c in inflows[(y, x)] if order[c] > 0]
                if len(ins) < len(inflows[(y, x)]):
                    continue        # upstream not settled yet
                if not ins:
                    o = 1
                else:
                    m = max(ins)
                    o = m + 1 if ins.count(m) >= 2 else m
                if o != order[y, x]:
                    order[y, x] = o
                    changed = True
    order[~valid] = -1
    return order.astype(np.int32)


def test_kernel_hand_cases():
    e = _code(1, 0)
    # linear stream: all order 1
    assert (strahler_order(np.full((1, 6), e, np.uint8)) == 1).all()
    # Y confluence: two order-1s meet -> 2
    se, ne = _code(1, 1), _code(1, -1)
    d = np.zeros((3, 3), np.uint8)
    d[0, :], d[2, :], d[1, :] = se, ne, e
    o = strahler_order(d)
    assert o[1, 0] == 1 and o[1, 1] == 2 and o[1, 2] == 2
    # order only bumps on ties: a 2 joined by a 1 stays 2; 2+2 -> 3
    assert o[0, 1] == 1


def test_kernel_matches_brute_on_random_dems():
    from richdem_spark.kernels.d8 import d8_flow_directions
    from richdem_spark.kernels.fill import priority_flood_fill

    rng = np.random.default_rng(5)
    for trial in range(6):
        dem = priority_flood_fill(rng.random((17, 23)) * 50)
        dirs = d8_flow_directions(dem)
        got = strahler_order(dirs)
        exp = _brute_strahler(dirs)
        np.testing.assert_array_equal(got, exp, err_msg=f"trial {trial}")


def test_kernel_nodata_absorbs():
    e = _code(1, 0)
    dirs = np.full((1, 5), e, np.uint8)
    dirs[0, 2] = FLOWDIR_NO_DATA
    o = strahler_order(dirs)
    assert o[0, 2] == -1
    assert (o[0, [0, 1, 3, 4]] == 1).all()


def test_external_inflow_injection():
    e = _code(1, 0)
    dirs = np.full((1, 4), e, np.uint8)
    ext_m = np.zeros((1, 4), np.int64)
    ext_k = np.zeros((1, 4), np.int64)
    ext_m[0, 0], ext_k[0, 0] = 3, 2      # two order-3 inflows enter cell 0
    o = strahler_order(dirs, ext_m, ext_k)
    assert (o == 4).all()                # 3+3 -> 4, carried downstream


@pytest.mark.parametrize("tiling", [(8, 8), (16, 5), (7, 31)])
def test_tiled_matches_serial(spark, tiling):
    from richdem_spark.api import FlowDirectionsD8, StrahlerOrder
    from richdem_spark.kernels.d8 import d8_flow_directions
    from richdem_spark.kernels.fill import priority_flood_fill
    from richdem_spark.tiles import raster_from_array

    rng = np.random.default_rng(11)
    dem = priority_flood_fill(rng.random((41, 37)) * 80)
    exp = strahler_order(d8_flow_directions(dem))

    tw, th = tiling
    tr = raster_from_array(spark, dem, tile_w=tw, tile_h=th)
    metrics = {}
    got = StrahlerOrder(FlowDirectionsD8(tr), metrics=metrics).to_array()
    np.testing.assert_array_equal(got, exp)
    assert metrics["rounds"] >= 1
    assert metrics["changed_tiles_per_round"][-1] == 0


def test_tiled_single_tile_and_nodata(spark):
    from richdem_spark.api import FlowDirectionsD8, StrahlerOrder
    from richdem_spark.kernels.d8 import d8_flow_directions
    from richdem_spark.kernels.fill import priority_flood_fill
    from richdem_spark.tiles import raster_from_array

    rng = np.random.default_rng(23)
    dem = rng.random((20, 20)) * 60
    dem[5:9, 5:9] = -9999.0
    filled = priority_flood_fill(dem, nodata=-9999.0)
    exp = strahler_order(d8_flow_directions(filled, nodata=-9999.0))

    tr = raster_from_array(spark, filled, tile_w=64, tile_h=64,
                           nodata=-9999.0)
    got = StrahlerOrder(FlowDirectionsD8(tr)).to_array()
    np.testing.assert_array_equal(got, exp)
