"""Distributed multi-flow-direction (MFD) accumulation.

The reference parallelizes only D8 accumulation
(``programs/parallel_d8_accum``); MFD spreads flow across up to 8
neighbours, so the perimeter-graph trick does not apply.  We exploit
linearity instead: accumulation is linear in its sources, so

1. **Round 0** (halo + mapInPandas): per-tile proportions from the haloed
   elevations (FM_*), local accumulation of in-tile unit sources, and the
   mass crossing each seam (prop x accum on border cells).
2. **Round k**: crossing mass is injected as point sources at the entry
   cells of the receiving tiles and propagated with the same vectorized
   kernel; new crossings iterate until the total in-flight mass is zero.
   Rounds are bounded by the longest flow path's tile-transition count —
   O(grid diameter / tile size) worst case, typically a handful.

Each round shuffles only O(perimeter) injection rows; the proportions
tensor is computed once and persisted with the running totals.
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
    StringType,
    StructField,
    StructType,
)

from ..constants import D8X, D8Y, NO_DATA_GEN
from ..kernels import flowmet as fmk
from ..tiles import (
    TILE_SCHEMA,
    RasterMeta,
    TiledRaster,
    assemble_padded,
    halo_join,
    pack,
    unpack,
)

_STATE_SCHEMA = StructType(
    [
        StructField("tile_x", IntegerType(), False),
        StructField("tile_y", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("nodata", DoubleType(), True),
        StructField("props", BinaryType(), False),   # float32 h*w*9
        StructField("accum", BinaryType(), False),   # float64 running total
        StructField("ox", ArrayType(IntegerType()), False),
        StructField("oy", ArrayType(IntegerType()), False),
        StructField("otx", ArrayType(IntegerType()), False),
        StructField("oty", ArrayType(IntegerType()), False),
        StructField("oval", ArrayType(DoubleType()), False),
    ]
)

_FMS = {
    "Quinn": lambda e, nd, p: fmk.fm_quinn(e, nd),
    "Holmgren": lambda e, nd, p: fmk.fm_holmgren(e, nd, x=p or 1.0),
    "Freeman": lambda e, nd, p: fmk.fm_freeman(e, nd, p=p or 1.1),
    "Tarboton": lambda e, nd, p: fmk.fm_tarboton(e, nd),
    "Dinfinity": lambda e, nd, p: fmk.fm_tarboton(e, nd),
}


def _outflows(props, acc, tile_x, tile_y, w, h, meta):
    """Seam crossings: (local x, y, target tile, amount) summed per
    (slot,cell); vectorized over the border ring."""
    oxs, oys, otxs, otys, ovals = [], [], [], [], []
    for n in range(1, 9):
        p = props[..., n]
        dx, dy = int(D8X[n]), int(D8Y[n])
        # cells whose slot-n target lies outside the tile
        yy, xx = np.mgrid[0:h, 0:w]
        tx_ = xx + dx
        ty_ = yy + dy
        off = (tx_ < 0) | (tx_ >= w) | (ty_ < 0) | (ty_ >= h)
        m = off & (p > 0) & (acc > 0)
        if not m.any():
            continue
        gx = tile_x * meta.tile_w + tx_[m]
        gy = tile_y * meta.tile_h + ty_[m]
        ing = (gx >= 0) & (gx < meta.width) & (gy >= 0) & (gy < meta.height)
        if not ing.any():
            continue
        amount = (p[m] * acc[m])[ing]
        gx, gy = gx[ing], gy[ing]
        ttx = gx // meta.tile_w
        tty = gy // meta.tile_h
        oxs.append(gx - ttx * meta.tile_w)
        oys.append(gy - tty * meta.tile_h)
        otxs.append(ttx)
        otys.append(tty)
        ovals.append(amount)
    if not oxs:
        z = np.array([], dtype=np.int64)
        return z, z, z, z, np.array([])
    return (np.concatenate(oxs), np.concatenate(oys),
            np.concatenate(otxs), np.concatenate(otys),
            np.concatenate(ovals))


def flow_accumulation_mfd(
    tr: TiledRaster, method: str = "Quinn", exponent: float | None = None,
    max_rounds: int = 10_000,
) -> TiledRaster:
    meta = tr.meta
    fm = _FMS[method]

    def round0(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {f.name: [] for f in _STATE_SCHEMA.fields}
            for r in pdf.itertuples():
                core = unpack(r.data, r.height, r.width, r.dtype)
                strips = ([(s["slot"], s["strip"]) for s in r.halo]
                          if r.halo is not None else [])
                fill = r.nodata if r.nodata is not None else 0.0
                padded, pt, pl = assemble_padded(core, strips, r.dtype,
                                                 fill)
                props_p = fm(padded.astype(np.float64), r.nodata, exponent)
                props = props_p[pt : pt + r.height, pl : pl + r.width, :]
                props = np.ascontiguousarray(props, dtype=np.float32)
                acc = fmk.prop_flow_accum(props)
                accv = np.where(acc < 0, 0.0, acc)
                ox, oy, otx, oty, ov = _outflows(
                    props, accv, r.tile_x, r.tile_y, r.width, r.height,
                    meta,
                )
                out["tile_x"].append(r.tile_x)
                out["tile_y"].append(r.tile_y)
                out["width"].append(r.width)
                out["height"].append(r.height)
                out["nodata"].append(r.nodata)
                out["props"].append(pack(props))
                out["accum"].append(pack(acc))
                out["ox"].append(ox.astype("int32").tolist())
                out["oy"].append(oy.astype("int32").tolist())
                out["otx"].append(otx.astype("int32").tolist())
                out["oty"].append(oty.astype("int32").tolist())
                out["oval"].append(ov.tolist())
            yield pd.DataFrame(out)

    state = halo_join(tr).mapInPandas(round0, _STATE_SCHEMA).persist()

    for _round in range(max_rounds):
        # loop-control scalar only — the injection rows themselves never
        # touch the driver: they are exploded, re-keyed by target tile
        # and shuffled straight back (one O(perimeter) exchange)
        n_out = state.agg(
            F.sum(F.size("ox")).alias("n")
        ).first()["n"]
        if not n_out:
            break
        inj_df = (
            state.select(
                F.explode(
                    F.arrays_zip("ox", "oy", "otx", "oty", "oval")
                ).alias("o")
            )
            .select(
                F.col("o.otx").alias("tile_x"),
                F.col("o.oty").alias("tile_y"),
                F.struct(
                    F.col("o.ox").alias("ix"),
                    F.col("o.oy").alias("iy"),
                    F.col("o.oval").alias("iv"),
                ).alias("inj"),
            )
            .groupBy("tile_x", "tile_y")
            .agg(F.collect_list("inj").alias("inj"))
        )
        joined = state.join(inj_df, ["tile_x", "tile_y"], "left")

        def step(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                out = {f.name: [] for f in _STATE_SCHEMA.fields}
                for r in pdf.itertuples():
                    h, w = r.height, r.width
                    acc = unpack(r.accum, h, w, "float64").copy()
                    props = np.frombuffer(
                        r.props, dtype=np.float32
                    ).reshape(h, w, 9)
                    if r.inj is not None and len(r.inj):
                        inj = np.zeros((h, w))
                        ixs = np.array([s["ix"] for s in r.inj],
                                       dtype=np.int64)
                        iys = np.array([s["iy"] for s in r.inj],
                                       dtype=np.int64)
                        ivs = np.array([s["iv"] for s in r.inj])
                        np.add.at(inj, (iys, ixs), ivs)
                        add = fmk.prop_flow_accum(props, weights=inj)
                        addv = np.where(add < 0, 0.0, add)
                        acc = np.where(acc < 0, acc, acc + addv)
                        ox, oy, otx, oty, ov = _outflows(
                            props, addv, r.tile_x, r.tile_y, w, h, meta,
                        )
                    else:
                        z = np.array([], dtype=np.int64)
                        ox = oy = otx = oty = z
                        ov = np.array([])
                    out["tile_x"].append(r.tile_x)
                    out["tile_y"].append(r.tile_y)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["nodata"].append(r.nodata)
                    out["props"].append(r.props)
                    out["accum"].append(pack(acc))
                    out["ox"].append(ox.astype("int32").tolist())
                    out["oy"].append(oy.astype("int32").tolist())
                    out["otx"].append(otx.astype("int32").tolist())
                    out["oty"].append(oty.astype("int32").tolist())
                    out["oval"].append(ov.tolist())
                yield pd.DataFrame(out)

        # localCheckpoint truncates lineage so the plan stays flat
        # across rounds
        new_state = joined.mapInPandas(step, _STATE_SCHEMA) \
            .localCheckpoint(eager=True)
        state.unpersist()
        state = new_state

    out_df = state.select(
        "tile_x", "tile_y", "width", "height",
        F.lit("float64").alias("dtype"),
        F.lit(-1.0).alias("nodata"),
        F.col("accum").alias("data"),
    )
    new_meta = RasterMeta(
        width=meta.width, height=meta.height, tile_w=meta.tile_w,
        tile_h=meta.tile_h, nodata=-1.0, dtype="float64",
        geotransform=meta.geotransform, projection=meta.projection,
        history=meta.history,
    ).with_history(f"flow_accumulation_mfd({method})")
    return TiledRaster(out_df, new_meta)
