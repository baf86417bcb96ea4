"""Distributed depression filling — the two-pass tile-merge algorithm
(Barnes 2016), re-derived Spark-first from
``programs/parallel_priority_flood/main.cpp``.

Execution plan (exactly the paper's O(perimeter) communication bound):

1. **Round 1** (mapInPandas, embarrassingly parallel): per-tile
   watershed-labelled Priority-Flood -> filled blob + label blob +
   in-tile spillover edges (kernels/fill.py:fill_tile_labels).
2. **Seam join** (one O(perimeter) shuffle): each tile emits its four
   border strips (labels + filled elevation) keyed by the canonical seam
   id; ``groupBy(seam)`` pairs adjacent strips and emits cross-tile
   label edges ``max(elev_a, elev_b)`` with the min saddle kept per pair
   (``HandleEdge``/``HandleCorner``, main.cpp:344-398).
3. **Global solve** (driver): aggregated Priority-Flood over the label
   graph seeded from the ocean at -inf (main.cpp:498-545).  The graph is
   |labels|-sized — ~4·sqrt(cells/tile) per tile — vastly smaller than
   the raster.
4. **Round 2** (mapInPandas): raise each cell to
   ``max(filled, graph_elev[label])`` (main.cpp:315-330).  Water levels
   are shipped back by a JOIN on tile id (not a driver broadcast), so the
   solve result never needs to fit in one executor's broadcast budget.
"""

from __future__ import annotations

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

from ..constants import TOPO_D8
from ..kernels.fill import fill_tile_labels, graph_priority_flood
from ..tiles import TILE_SCHEMA, RasterMeta, TiledRaster, pack, unpack

_R1_SCHEMA = StructType(
    [
        StructField("tile_x", IntegerType(), False),
        StructField("tile_y", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("dtype", StringType(), False),
        StructField("nodata", DoubleType(), True),
        StructField("data", BinaryType(), False),      # filled elevations
        StructField("labels", BinaryType(), False),    # int64 labels
        StructField("edge_a", ArrayType(LongType()), False),
        StructField("edge_b", ArrayType(LongType()), False),
        StructField("edge_z", ArrayType(DoubleType()), False),
    ]
)

_SEAM_SCHEMA = StructType(
    [
        StructField("kind", StringType(), False),  # V | H | C
        StructField("sx", IntegerType(), False),
        StructField("sy", IntegerType(), False),
        StructField("role", IntegerType(), False),
        StructField("lab", BinaryType(), False),
        StructField("elv", BinaryType(), False),
    ]
)

_EDGE_SCHEMA = StructType(
    [
        StructField("a", LongType(), False),
        StructField("b", LongType(), False),
        StructField("z", DoubleType(), False),
    ]
)


def _label_stride(meta: RasterMeta) -> int:
    # max watershed labels per tile = #perimeter cells (each flood seed is a
    # perimeter cell) + slack
    return 2 * (meta.tile_w + meta.tile_h) + 8


def _round1(meta: RasterMeta, topology: str):
    stride = _label_stride(meta)
    ntx = meta.ntiles_x

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "tile_x", "tile_y", "width", "height", "dtype", "nodata",
                "data", "labels", "edge_a", "edge_b", "edge_z")}
            for r in pdf.itertuples():
                a = unpack(r.data, r.height, r.width, r.dtype).astype(
                    np.float64
                )
                base = 2 + (r.tile_y * ntx + r.tile_x) * stride
                filled, labels, edges = fill_tile_labels(
                    a, r.nodata, meta.edge_mask(r.tile_x, r.tile_y), base,
                    topology,
                )
                ea, eb, ez = [], [], []
                for (la, lb), z in edges.items():
                    ea.append(la)
                    eb.append(lb)
                    ez.append(float(z))
                out["tile_x"].append(r.tile_x)
                out["tile_y"].append(r.tile_y)
                out["width"].append(r.width)
                out["height"].append(r.height)
                out["dtype"].append("float64")
                out["nodata"].append(r.nodata)
                out["data"].append(pack(filled))
                out["labels"].append(pack(labels))
                out["edge_a"].append(ea)
                out["edge_b"].append(eb)
                out["edge_z"].append(ez)
            yield pd.DataFrame(out)

    return run


def _emit_seam_strips(meta: RasterMeta):
    ntx, nty = meta.ntiles_x, meta.ntiles_y

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("kind", "sx", "sy", "role", "lab", "elv")}

            def emit(kind, sx, sy, role, lab, elv):
                out["kind"].append(kind)
                out["sx"].append(sx)
                out["sy"].append(sy)
                out["role"].append(role)
                out["lab"].append(pack(np.ascontiguousarray(lab,
                                                            dtype=np.int64)))
                out["elv"].append(pack(np.ascontiguousarray(elv,
                                                            np.float64)))

            for r in pdf.itertuples():
                lab = unpack(r.labels, r.height, r.width, "int64")
                elv = unpack(r.data, r.height, r.width, "float64")
                tx, ty = r.tile_x, r.tile_y
                if tx + 1 < ntx:
                    emit("V", tx, ty, 0, lab[:, -1], elv[:, -1])
                if tx > 0:
                    emit("V", tx - 1, ty, 1, lab[:, 0], elv[:, 0])
                if ty + 1 < nty:
                    emit("H", tx, ty, 0, lab[-1, :], elv[-1, :])
                if ty > 0:
                    emit("H", tx, ty - 1, 1, lab[0, :], elv[0, :])
                # corner seam C(sx,sy) spans tiles (sx,sy)..(sx+1,sy+1);
                # roles 0=BR of TL tile, 1=BL of TR, 2=TR of BL, 3=TL of BR
                if tx + 1 < ntx and ty + 1 < nty:
                    emit("C", tx, ty, 0, lab[-1:, -1], elv[-1:, -1])
                if tx > 0 and ty + 1 < nty:
                    emit("C", tx - 1, ty, 1, lab[-1:, 0], elv[-1:, 0])
                if tx + 1 < ntx and ty > 0:
                    emit("C", tx, ty - 1, 2, lab[:1, -1], elv[:1, -1])
                if tx > 0 and ty > 0:
                    emit("C", tx - 1, ty - 1, 3, lab[:1, 0], elv[:1, 0])
            yield pd.DataFrame(out)

    return run


def _seam_edges(topology: str):
    diag = topology == TOPO_D8

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        kind = key[0]
        parts = {
            int(role): (
                np.frombuffer(lab, dtype=np.int64),
                np.frombuffer(elv, dtype=np.float64),
            )
            for role, lab, elv in zip(pdf["role"], pdf["lab"], pdf["elv"])
        }
        best: dict[tuple[int, int], float] = {}

        def add(la, lb, z):
            if la == lb:
                return
            k = (la, lb) if la < lb else (lb, la)
            if k not in best or z < best[k]:
                best[k] = z

        if kind == "C":
            # diagonal pairs across the 4-tile corner
            if diag:
                for p, q in ((0, 3), (1, 2)):
                    if p in parts and q in parts:
                        la, ea = parts[p]
                        lb, eb = parts[q]
                        add(int(la[0]), int(lb[0]),
                            float(max(ea[0], eb[0])))
        elif 0 in parts and 1 in parts:
            la, ea = parts[0]
            lb, eb = parts[1]
            n = len(la)
            offs = (-1, 0, 1) if diag else (0,)
            for off in offs:
                lo, hi = max(0, -off), min(n, n - off)
                s1 = slice(lo, hi)
                s2 = slice(lo + off, hi + off)
                l1, l2 = la[s1], lb[s2]
                z = np.maximum(ea[s1], eb[s2])
                neq = l1 != l2
                for aa, bb, zz in zip(l1[neq], l2[neq], z[neq]):
                    add(int(aa), int(bb), float(zz))
        if not best:
            return pd.DataFrame({"a": [], "b": [], "z": []}).astype(
                {"a": "int64", "b": "int64", "z": "float64"}
            )
        ks = list(best.keys())
        return pd.DataFrame(
            {
                "a": [k[0] for k in ks],
                "b": [k[1] for k in ks],
                "z": [best[k] for k in ks],
            }
        )

    return run


def fill_depressions(
    tr: TiledRaster, topology: str = TOPO_D8, epsilon: bool = False
) -> TiledRaster:
    """Distributed Priority-Flood depression fill.

    ``epsilon=True`` additionally applies the reference's
    ``np.nextafter`` drainage-gradient semantics
    (``depressions/Barnes2014.hpp:335-420``); v1 realizes it per-tile
    after the global raise, seeded from each tile's spill levels — exact
    for single-tile rasters, drainage-property-correct for multi-tile
    (see SURVEY.md §7.3).
    """
    meta = tr.meta
    spark = tr.df.sparkSession

    r1 = tr.df.mapInPandas(_round1(meta, topology), _R1_SCHEMA).persist()

    in_tile_edges = r1.select(
        F.explode(F.arrays_zip("edge_a", "edge_b", "edge_z")).alias("e")
    ).select(
        F.col("e.edge_a").alias("a"),
        F.col("e.edge_b").alias("b"),
        F.col("e.edge_z").alias("z"),
    )
    seams = r1.mapInPandas(_emit_seam_strips(meta), _SEAM_SCHEMA)
    seam_edges = seams.groupBy("kind", "sx", "sy").applyInPandas(
        _seam_edges(topology), _EDGE_SCHEMA
    )
    # JVM-side partial aggregation keeps the collected graph minimal
    all_edges = (
        in_tile_edges.unionByName(seam_edges)
        .groupBy("a", "b")
        .agg(F.min("z").alias("z"))
        .collect()
    )

    graph_elev = graph_priority_flood([(r.a, r.b, r.z) for r in all_edges])

    # ship water levels back via a join on tile id (scales past broadcast)
    stride = _label_stride(meta)
    ntx = meta.ntiles_x
    lvl_rows = [
        (int((l - 2) // stride), int(l), float(z))
        for l, z in graph_elev.items()
        if l > 1 and z != -np.inf
    ]
    lvl_schema = StructType(
        [
            StructField("tid", IntegerType(), False),
            StructField("label", LongType(), False),
            StructField("level", DoubleType(), False),
        ]
    )
    lvl_df = (
        spark.createDataFrame(lvl_rows, lvl_schema)
        .groupBy("tid")
        .agg(F.collect_list(F.struct("label", "level")).alias("levels"))
        if lvl_rows
        else None
    )

    r1k = r1.withColumn(
        "tid", (F.col("tile_y") * F.lit(ntx) + F.col("tile_x")).cast("int")
    )
    joined = (
        r1k.join(F.broadcast(lvl_df), "tid", "left")
        if lvl_df is not None
        else r1k.withColumn("levels", F.lit(None).cast(
            ArrayType(StructType([StructField("label", LongType()),
                                  StructField("level", DoubleType())]))))
    )

    eps = bool(epsilon)

    def round2(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.fill import priority_flood_fill

        for pdf in it:
            out = {k: [] for k in (
                "tile_x", "tile_y", "width", "height",
                "dtype", "nodata", "data")}
            for r in pdf.itertuples():
                filled = unpack(
                    r.data, r.height, r.width, "float64"
                ).copy()
                labels = unpack(r.labels, r.height, r.width, "int64")
                levels = r.levels
                if levels is not None and len(levels):
                    lk = np.array([int(s["label"]) for s in levels],
                                  dtype=np.int64)
                    lv = np.array([float(s["level"]) for s in levels])
                    order = np.argsort(lk)
                    lk, lv = lk[order], lv[order]
                    # vectorized label -> water-level map; labels absent
                    # from the solve keep -inf (no raise)
                    pos = np.searchsorted(lk, labels.ravel())
                    pos_c = np.clip(pos, 0, len(lk) - 1)
                    hit = lk[pos_c] == labels.ravel()
                    raise_to = np.where(hit, lv[pos_c], -np.inf).reshape(
                        labels.shape
                    )
                    filled = np.maximum(filled, raise_to)
                if eps:
                    filled = priority_flood_fill(
                        filled, r.nodata, topology, epsilon=True
                    )
                out["tile_x"].append(r.tile_x)
                out["tile_y"].append(r.tile_y)
                out["width"].append(r.width)
                out["height"].append(r.height)
                out["dtype"].append("float64")
                out["nodata"].append(r.nodata)
                out["data"].append(pack(filled))
            yield pd.DataFrame(out)

    out_df = joined.mapInPandas(round2, TILE_SCHEMA)
    new_meta = RasterMeta(
        width=meta.width, height=meta.height, tile_w=meta.tile_w,
        tile_h=meta.tile_h, nodata=meta.nodata, dtype="float64",
        geotransform=meta.geotransform, projection=meta.projection,
        history=meta.history,
    ).with_history(
        f"fill_depressions(topology={topology}, epsilon={epsilon})"
    )
    return TiledRaster(out_df, new_meta)
