"""Distributed D8 flow accumulation — the two-pass perimeter-graph
algorithm (Barnes 2017), re-derived Spark-first from
``programs/parallel_d8_accum/main.cpp``.

1. **Round 1** (mapInPandas): per-tile local accumulation (Kahn kernel,
   kernels/d8.py) + per-cell in-tile exit computation (``FollowPath``,
   main.cpp:270-334, here vectorized pointer doubling).  Only the
   perimeter cells' records leave the tile — O(perimeter) rows.
2. **Global solve** (driver): Kahn propagation over the cross-tile
   perimeter graph (``DownstreamCell`` handoffs + in-tile transport
   links, main.cpp:647-862) producing per-entry-cell inflow offsets.
3. **Round 2** (mapInPandas): offsets are injected as point-source
   weights and propagated along in-tile paths with the same vectorized
   kernel — the batched equivalent of ``FollowPathAdd``
   (main.cpp:344-370); result = local + offset accumulation.

Flow into NoData disappears and flow off the global DEM edge leaves the
system, matching ``methods/d8_methods.hpp:47-139``.
"""

from __future__ import annotations

from collections import defaultdict, deque
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..constants import D8X, D8Y, FLOWDIR_NO_DATA
from ..kernels.d8 import d8_flow_accum, exit_cell_of
from ..tiles import TILE_SCHEMA, RasterMeta, TiledRaster, pack, unpack

_R1_SCHEMA = StructType(
    [
        StructField("tile_x", IntegerType(), False),
        StructField("tile_y", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("dirs", BinaryType(), False),
        StructField("accum", BinaryType(), False),
        StructField("nodata", DoubleType(), True),
        # perimeter records: local x,y, local accum, exit cell qx,qy,
        # exit dir (0 if the path terminates in-tile)
        StructField("px", ArrayType(IntegerType()), False),
        StructField("py", ArrayType(IntegerType()), False),
        StructField("pacc", ArrayType(DoubleType()), False),
        StructField("qx", ArrayType(IntegerType()), False),
        StructField("qy", ArrayType(IntegerType()), False),
        StructField("qdir", ArrayType(IntegerType()), False),
        StructField("pvalid", ArrayType(IntegerType()), False),
    ]
)


def _perimeter_indices(h: int, w: int) -> tuple[np.ndarray, np.ndarray]:
    xs = [np.arange(w), np.arange(w)]
    ys = [np.zeros(w, dtype=np.int64), np.full(w, h - 1, dtype=np.int64)]
    if h > 2:
        mid = np.arange(1, h - 1)
        xs += [np.zeros(h - 2, dtype=np.int64), np.full(h - 2, w - 1,
                                                        dtype=np.int64)]
        ys += [mid, mid]
    return np.concatenate(xs), np.concatenate(ys)


def _round1(weights_mode: str):
    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "tile_x", "tile_y", "width", "height", "dirs", "accum",
                "nodata", "px", "py", "pacc", "qx", "qy", "qdir", "pvalid")}
            for r in pdf.itertuples():
                dirs = unpack(r.data, r.height, r.width, r.dtype).astype(
                    np.uint8
                )
                w_arr = None
                if weights_mode == "column":
                    w_arr = unpack(r.wdata, r.height, r.width, "float64")
                acc = d8_flow_accum(dirs, weights=w_arr)
                ex = exit_cell_of(dirs)
                pxs, pys = _perimeter_indices(r.height, r.width)
                flat = pys * r.width + pxs
                q = ex[flat]
                qx = np.where(q >= 0, q % r.width, -1).astype(np.int64)
                qy = np.where(q >= 0, q // r.width, -1).astype(np.int64)
                d = dirs.ravel()
                qdir = np.where(q >= 0, d[np.maximum(q, 0)], 0).astype(
                    np.int64
                )
                # qdir only matters when it steps OFF the tile
                tgt_x = qx + D8X[np.clip(qdir, 0, 8)]
                tgt_y = qy + D8Y[np.clip(qdir, 0, 8)]
                exits = (
                    (qdir >= 1) & (qdir <= 8)
                    & ((tgt_x < 0) | (tgt_x >= r.width)
                       | (tgt_y < 0) | (tgt_y >= r.height))
                )
                qdir = np.where(exits, qdir, 0)
                valid = (d[flat] != FLOWDIR_NO_DATA).astype(np.int64)
                out["tile_x"].append(r.tile_x)
                out["tile_y"].append(r.tile_y)
                out["width"].append(r.width)
                out["height"].append(r.height)
                out["dirs"].append(pack(dirs))
                out["accum"].append(pack(acc))
                out["nodata"].append(r.nodata)
                out["px"].append(pxs.astype("int32").tolist())
                out["py"].append(pys.astype("int32").tolist())
                out["pacc"].append(acc.ravel()[flat].tolist())
                out["qx"].append(qx.astype("int32").tolist())
                out["qy"].append(qy.astype("int32").tolist())
                out["qdir"].append(qdir.astype("int32").tolist())
                out["pvalid"].append(valid.tolist())
            yield pd.DataFrame(out)

    return run


def _solve_perimeter_graph(perim_rows, meta: RasterMeta):
    """Kahn propagation over the cross-tile perimeter graph.

    Returns {(tile_x, tile_y): {(x, y): offset}} of external inflows.
    """
    route = {}      # (t,x,y) -> (qx,qy,qdir) exit info for this cell's path
    laccum = {}     # (t,x,y) -> local accumulation at the cell
    valid = {}
    dims = {}
    for row in perim_rows:
        t = (row.tile_x, row.tile_y)
        dims[t] = (row.width, row.height)
        for i in range(len(row.px)):
            c = (t, row.px[i], row.py[i])
            route[c] = (row.qx[i], row.qy[i], row.qdir[i])
            laccum[c] = row.pacc[i]
            valid[c] = bool(row.pvalid[i])

    ntx, nty = meta.ntiles_x, meta.ntiles_y

    def handoff(t, qx, qy, qdir):
        """Global target cell of an exiting step, or None off-DEM."""
        tx, ty = t
        gx = tx * meta.tile_w + qx + int(D8X[qdir])
        gy = ty * meta.tile_h + qy + int(D8Y[qdir])
        if not (0 <= gx < meta.width and 0 <= gy < meta.height):
            return None
        ttx, tty = gx // meta.tile_w, gy // meta.tile_h
        return ((ttx, tty), gx - ttx * meta.tile_w, gy - tty * meta.tile_h)

    # exit nodes: exit cells of any perimeter path leaving the tile; the
    # exit cell is itself a perimeter cell, so it appears in `route`
    exit_set = set()
    for c, (qx, qy, qdir) in route.items():
        if qdir != 0 and valid[c]:
            exit_set.add((c[0], qx, qy))

    indeg = defaultdict(int)
    recv = defaultdict(float)
    entry_offsets: dict[tuple, dict[tuple, float]] = defaultdict(dict)

    def route_of(cell):
        """Exit node reached from an entry cell, or None if the path
        terminates in-tile."""
        if cell not in route or not valid[cell]:
            return None
        qx, qy, qdir = route[cell]
        if qdir == 0:
            return None
        return (cell[0], qx, qy)

    # build indegrees: edge e -> route(handoff-target(e))
    succ = {}
    for e in exit_set:
        qx, qy, qdir = route[e][0], route[e][1], route[e][2]
        # e IS the exit cell, so its own stored route points to itself
        tgt = handoff(e[0], e[1], e[2], route[e][2])
        if tgt is None:
            succ[e] = (None, None)
            continue
        (tt, rx, ry) = tgt
        rcell = (tt, rx, ry)
        if rcell not in valid or not valid[rcell]:
            succ[e] = (None, None)  # flows into NoData: disappears
            continue
        e2 = route_of(rcell)
        succ[e] = (rcell, e2)
        if e2 is not None:
            indeg[e2] += 1

    ready = deque(e for e in exit_set if indeg[e] == 0)
    done = 0
    while ready:
        e = ready.popleft()
        done += 1
        amount = laccum[e] + recv[e]
        rcell, e2 = succ[e]
        if rcell is None:
            continue
        t2 = rcell[0]
        key = (rcell[1], rcell[2])
        entry_offsets[t2][key] = entry_offsets[t2].get(key, 0.0) + amount
        if e2 is not None:
            recv[e2] += amount
            indeg[e2] -= 1
            if indeg[e2] == 0:
                ready.append(e2)
    if done != len(exit_set):
        raise RuntimeError(
            f"cross-tile flow loop detected: {len(exit_set) - done} "
            "perimeter cells unresolved (cf. rd_loop_check)"
        )
    return entry_offsets


def flow_accumulation_d8(dirs: TiledRaster) -> TiledRaster:
    """Flow accumulation from a D8 flow-direction raster (tiled,
    two rounds, O(perimeter) communication)."""
    meta = dirs.meta
    spark = dirs.df.sparkSession

    r1 = dirs.df.mapInPandas(_round1("none"), _R1_SCHEMA).persist()

    perim = r1.select(
        "tile_x", "tile_y", "width", "height",
        "px", "py", "pacc", "qx", "qy", "qdir", "pvalid",
    ).collect()

    entry_offsets = _solve_perimeter_graph(perim, meta)

    off_rows = [
        (tx, ty,
         [int(k[0]) for k in d], [int(k[1]) for k in d],
         [float(v) for v in d.values()])
        for (tx, ty), d in entry_offsets.items()
    ]
    off_schema = StructType(
        [
            StructField("tile_x", IntegerType(), False),
            StructField("tile_y", IntegerType(), False),
            StructField("ox", ArrayType(IntegerType()), False),
            StructField("oy", ArrayType(IntegerType()), False),
            StructField("oval", ArrayType(DoubleType()), False),
        ]
    )
    if off_rows:
        off_df = spark.createDataFrame(off_rows, off_schema)
        joined = r1.join(F.broadcast(off_df), ["tile_x", "tile_y"], "left")
    else:
        joined = (
            r1.withColumn("ox", F.lit(None).cast(ArrayType(IntegerType())))
            .withColumn("oy", F.lit(None).cast(ArrayType(IntegerType())))
            .withColumn("oval", F.lit(None).cast(ArrayType(DoubleType())))
        )

    def round2(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "tile_x", "tile_y", "width", "height",
                "dtype", "nodata", "data")}
            for r in pdf.itertuples():
                acc = unpack(r.accum, r.height, r.width, "float64").copy()
                if r.ox is not None and len(r.ox):
                    d = unpack(r.dirs, r.height, r.width, "uint8")
                    inj = np.zeros((r.height, r.width))
                    for x, y, v in zip(r.ox, r.oy, r.oval):
                        inj[y, x] += v
                    add = d8_flow_accum(d, weights=inj)
                    add[add < 0] = 0.0  # NoData markers from the kernel
                    acc = acc + add
                    acc[unpack(r.accum, r.height, r.width,
                               "float64") < 0] = -1.0
                out["tile_x"].append(r.tile_x)
                out["tile_y"].append(r.tile_y)
                out["width"].append(r.width)
                out["height"].append(r.height)
                out["dtype"].append("float64")
                out["nodata"].append(-1.0)
                out["data"].append(pack(acc))
            yield pd.DataFrame(out)

    out_df = joined.mapInPandas(round2, TILE_SCHEMA)
    new_meta = RasterMeta(
        width=meta.width, height=meta.height, tile_w=meta.tile_w,
        tile_h=meta.tile_h, nodata=-1.0, dtype="float64",
        geotransform=meta.geotransform, projection=meta.projection,
        history=meta.history,
    ).with_history("flow_accumulation_d8")
    return TiledRaster(out_df, new_meta)
