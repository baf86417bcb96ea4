"""Tile-table substrate: the engine's native representation of a raster.

A raster is a DataFrame with one row per tile::

    tile_x:int, tile_y:int, width:int, height:int, dtype:string,
    nodata:double, data:binary   (row-major NumPy blob)

plus a driver-side :class:`RasterMeta` handle carrying grid-level metadata
(the reference's geotransform/projection/PROCESSING_HISTORY,
``include/richdem/common/Array2D.hpp:92-96,1152-1158``) and the tile-grid
shape.  Tiles are the unit of parallelism — the Spark analogue of the
reference's ``TileInfo`` grid
(``programs/parallel_priority_flood/main.cpp:66-116``).

Scale notes (100 TB design):

* the tile key ``(tile_y, tile_x)`` is the partition key everywhere; all
  per-tile kernels are ``mapInPandas`` (no shuffle), and every cross-tile
  operator exchanges **O(perimeter) seam strips only** — interiors are
  never shuffled (mirrors the reference's perimeter-only serialization,
  ``programs/parallel_d8_accum/perimeters.hpp:44-62``).
* at sandbox scale the DataFrames read from parquet; on a cluster the same
  schema is an Iceberg table partitioned by ``(tile_y, tile_x)`` giving
  partition pruning for window reads (``Array2D.hpp:133-188`` semantics).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from datetime import datetime, timezone
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .constants import GRID_BOTTOM, GRID_LEFT, GRID_RIGHT, GRID_TOP

TILE_SCHEMA = StructType(
    [
        StructField("tile_x", IntegerType(), False),
        StructField("tile_y", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("dtype", StringType(), False),
        StructField("nodata", DoubleType(), True),
        StructField("data", BinaryType(), False),
    ]
)

# Optional border-strip columns a producing kernel can emit alongside the
# tile blob (N row, S row, W column, E column of ``data``, same dtype).
# They cost microseconds to slice in a kernel that already holds the
# array, and let :func:`halo_join` assemble the halo exchange entirely in
# the JVM — no extra Python pass over every tile per focal op (guide
# §1.2: remove passes).  Any op that MODIFIES data and does not re-emit
# fresh strips must drop them; mapInPandas with plain TILE_SCHEMA output
# does that automatically, so strips exist only where explicitly emitted.
HALO_STRIP_COLS = ("hs_n", "hs_s", "hs_w", "hs_e")

TILE_HALO_SCHEMA = StructType(
    list(TILE_SCHEMA.fields)
    + [StructField(c, BinaryType(), True) for c in HALO_STRIP_COLS]
)


@dataclass
class RasterMeta:
    """Driver-side raster catalog entry."""

    width: int
    height: int
    tile_w: int
    tile_h: int
    nodata: float | None = None
    dtype: str = "float64"
    geotransform: tuple = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    projection: str = ""
    history: list[str] = field(default_factory=list)

    @property
    def ntiles_x(self) -> int:
        return (self.width + self.tile_w - 1) // self.tile_w

    @property
    def ntiles_y(self) -> int:
        return (self.height + self.tile_h - 1) // self.tile_h

    @property
    def cell_length_x(self) -> float:
        return abs(self.geotransform[1])

    @property
    def cell_length_y(self) -> float:
        return abs(self.geotransform[5])

    @property
    def cell_area(self) -> float:
        return self.cell_length_x * self.cell_length_y

    def tile_dims(self, tx: int, ty: int) -> tuple[int, int]:
        w = min(self.tile_w, self.width - tx * self.tile_w)
        h = min(self.tile_h, self.height - ty * self.tile_h)
        return w, h

    def edge_mask(self, tx: int, ty: int) -> int:
        m = 0
        if tx == 0:
            m |= GRID_LEFT
        if ty == 0:
            m |= GRID_TOP
        if tx == self.ntiles_x - 1:
            m |= GRID_RIGHT
        if ty == self.ntiles_y - 1:
            m |= GRID_BOTTOM
        return m

    def with_history(self, op: str) -> "RasterMeta":
        """Append a lineage record (the reference's PROCESSING_HISTORY,
        Array2D.hpp:1134-1147)."""
        stamp = f"{datetime.now(timezone.utc).isoformat()} | {op}"
        return replace(self, history=[*self.history, stamp])


def pack(arr: np.ndarray) -> bytes:
    return np.ascontiguousarray(arr).tobytes()


def unpack(blob: bytes, h: int, w: int, dtype: str) -> np.ndarray:
    return np.frombuffer(blob, dtype=np.dtype(dtype)).reshape(h, w)


class TiledRaster:
    """Handle pairing the tile DataFrame with its RasterMeta."""

    def __init__(self, df: DataFrame, meta: RasterMeta):
        self.df = df
        self.meta = meta

    def persist(self) -> "TiledRaster":
        self.df = self.df.persist()
        return self

    def unpersist(self) -> "TiledRaster":
        self.df.unpersist()
        return self

    def to_array(self) -> np.ndarray:
        """Collect and reassemble the full grid (tests / small rasters)."""
        m = self.meta
        out = np.zeros((m.height, m.width), dtype=np.dtype(m.dtype))
        for row in self.df.collect():
            a = unpack(row.data, row.height, row.width, row.dtype)
            oy, ox = row.tile_y * m.tile_h, row.tile_x * m.tile_w
            out[oy : oy + row.height, ox : ox + row.width] = a
        return out

    def cells(self) -> DataFrame:
        """Exploded per-cell view ``(x, y, value)`` in global coordinates —
        the relational edge of the engine (joins, SQL, tests)."""
        m = self.meta
        schema = StructType(
            [
                StructField("x", IntegerType(), False),
                StructField("y", IntegerType(), False),
                StructField("value", DoubleType(), True),
            ]
        )

        tw, th = m.tile_w, m.tile_h

        def explode_tiles(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                for r in pdf.itertuples():
                    a = unpack(r.data, r.height, r.width, r.dtype)
                    yy, xx = np.mgrid[0 : r.height, 0 : r.width]
                    yield pd.DataFrame(
                        {
                            "x": (xx.ravel() + r.tile_x * tw).astype("int32"),
                            "y": (yy.ravel() + r.tile_y * th).astype("int32"),
                            "value": a.ravel().astype("float64"),
                        }
                    )

        return self.df.mapInPandas(explode_tiles, schema)


def raster_from_array(
    spark: SparkSession,
    arr: np.ndarray,
    tile_w: int = 256,
    tile_h: int = 256,
    nodata: float | None = None,
    geotransform: tuple = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
) -> TiledRaster:
    """Chop a NumPy grid into a tile DataFrame (test/ingest path)."""
    h, w = arr.shape
    meta = RasterMeta(
        width=w, height=h, tile_w=tile_w, tile_h=tile_h, nodata=nodata,
        dtype=str(arr.dtype), geotransform=tuple(geotransform),
    )
    rows = []
    for ty in range(meta.ntiles_y):
        for tx in range(meta.ntiles_x):
            tw, th = meta.tile_dims(tx, ty)
            sub = arr[
                ty * tile_h : ty * tile_h + th, tx * tile_w : tx * tile_w + tw
            ]
            rows.append(
                (tx, ty, tw, th, str(arr.dtype),
                 float(nodata) if nodata is not None else None, pack(sub))
            )
    df = copartition_tiles(spark.createDataFrame(rows, TILE_SCHEMA))
    return TiledRaster(df, meta)


def canonical_tile_partitions(spark: SparkSession) -> int:
    """The engine-wide tile partition count: spark.sql.shuffle.partitions.
    Every shuffle that keys on the tile key (halo strip groupBys, seam
    aggregations) lands on this count, so a tile table partitioned the
    same way joins them EXCHANGE-FREE — tile interiors never move."""
    return int(spark.conf.get("spark.sql.shuffle.partitions", "200"))


def copartition_tiles(df: DataFrame) -> DataFrame:
    """Hash-partition a tile table on the canonical key
    ``(tile_x, tile_y)`` at the canonical count — the in-session
    equivalent of a bucketed table.  Applied once at ingest/creation;
    all downstream per-tile ops (mapInPandas) preserve it."""
    return df.repartition(
        canonical_tile_partitions(df.sparkSession), "tile_x", "tile_y"
    )


def read_raster(
    spark: SparkSession, path: str, copartition: bool = True
) -> TiledRaster:
    """Read a tile table written by :func:`write_raster`.

    ``copartition=True`` (default) pays ONE ingest shuffle to land the
    tiles on the canonical ``(tile_x, tile_y)`` hash partitioning, after
    which every halo exchange / seam aggregation in the session joins
    the table exchange-free (see :func:`halo_join`).  A bucketed table
    (:func:`write_raster_table`) or an Iceberg table partitioned by the
    tile key makes even that ingest shuffle unnecessary."""
    df = spark.read.parquet(path)
    if copartition:
        df = copartition_tiles(df)
    import json

    with open(path.rstrip("/") + "/_raster_meta.json") as f:
        d = json.load(f)
    meta = RasterMeta(**d)
    return TiledRaster(df, meta)


def write_raster(tr: TiledRaster, path: str) -> None:
    """Parquet sink partitioned by tile key (Iceberg-shaped layout); the
    reference's ``saveGDAL`` + PROCESSING_HISTORY analogue
    (Array2D.hpp:1112-1190)."""
    tr.df.write.mode("overwrite").parquet(path)
    import json

    m = tr.meta
    with open(path.rstrip("/") + "/_raster_meta.json", "w") as f:
        json.dump(
            {
                "width": m.width, "height": m.height,
                "tile_w": m.tile_w, "tile_h": m.tile_h,
                "nodata": m.nodata, "dtype": m.dtype,
                "geotransform": list(m.geotransform),
                "projection": m.projection, "history": m.history,
            },
            f,
        )


def _meta_to_dict(m: RasterMeta) -> dict:
    return {
        "width": m.width, "height": m.height,
        "tile_w": m.tile_w, "tile_h": m.tile_h,
        "nodata": m.nodata, "dtype": m.dtype,
        "geotransform": list(m.geotransform),
        "projection": m.projection, "history": m.history,
    }


def write_raster_table(
    tr: TiledRaster, table: str, buckets: int | None = None
) -> None:
    """Bucketed catalog sink: the persistent form of the canonical tile
    partitioning.  A table bucketed by ``(tile_x, tile_y)`` is read back
    already hash-distributed on the tile key, so NO exchange — not even
    the one-time ingest shuffle — ever touches the tile blobs; this is
    the 100 TB substrate (an Iceberg table bucket-partitioned on the
    tile key behaves identically).  Raster metadata rides along as a
    table property."""
    import json

    spark = tr.df.sparkSession
    if buckets is None:
        buckets = canonical_tile_partitions(spark)
    (tr.df.write.bucketBy(buckets, "tile_x", "tile_y")
     .sortBy("tile_x", "tile_y")
     .format("parquet").mode("overwrite").saveAsTable(table))
    meta_json = json.dumps(_meta_to_dict(tr.meta)).replace("'", "''")
    spark.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES "
        f"('richdem_meta' = '{meta_json}')"
    )


def read_raster_table(spark: SparkSession, table: str) -> TiledRaster:
    """Read a bucketed tile table written by :func:`write_raster_table`;
    the scan reports the bucket distribution, so tile-key joins against
    it are exchange-free with zero ingest shuffle."""
    import json

    props = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    }
    meta = RasterMeta(**json.loads(props["richdem_meta"]))
    return TiledRaster(spark.table(table), meta)


# ---------------------------------------------------------------------------
# Halo exchange
# ---------------------------------------------------------------------------

# above this many bytes of packed halo strips, broadcasting them is no
# longer sensible; the join instead relies on both sides sharing the
# canonical (tile_x, tile_y) hash partitioning (see halo_join)
HALO_BROADCAST_MAX_BYTES = 256 * 1024 * 1024

# strip slot ids: position of the CONTRIBUTING strip relative to the
# receiving tile, using the reference's D8 numbering (constants.hpp:5-10)
#   2=NW 3=N 4=NE / 1=W 5=E / 8=SW 7=S 6=SE

_HALO_SCHEMA = StructType(
    [
        StructField("tile_x", IntegerType(), False),
        StructField("tile_y", IntegerType(), False),
        StructField("slot", IntegerType(), False),
        StructField("strip", BinaryType(), False),
    ]
)


def _emit_halo_strips(meta: RasterMeta):
    ntx, nty = meta.ntiles_x, meta.ntiles_y

    def emit(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .constants import D8X, D8Y

        for pdf in it:
            out = {"tile_x": [], "tile_y": [], "slot": [], "strip": []}
            for r in pdf.itertuples():
                a = unpack(r.data, r.height, r.width, r.dtype)
                # strips of ME that my 8 neighbours need, keyed by neighbour
                pieces = {
                    3: a[-1:, :],   # I'm the N neighbour of (ty+1): send S row
                    7: a[:1, :],
                    1: a[:, -1:],
                    5: a[:, :1],
                    2: a[-1:, -1:],
                    4: a[-1:, :1],
                    8: a[:1, -1:],
                    6: a[:1, :1],
                }
                for slot, piece in pieces.items():
                    # receiving tile = me shifted by the inverse offset
                    ntx_, nty_ = (
                        r.tile_x - int(D8X[slot]),
                        r.tile_y - int(D8Y[slot]),
                    )
                    if 0 <= ntx_ < ntx and 0 <= nty_ < nty:
                        out["tile_x"].append(ntx_)
                        out["tile_y"].append(nty_)
                        out["slot"].append(slot)
                        out["strip"].append(pack(piece))
            yield pd.DataFrame(out)

    return emit


def assemble_padded(
    core: np.ndarray,
    strips: list[tuple[int, bytes]],
    dtype: str,
    fill_value: float,
) -> tuple[np.ndarray, int, int]:
    """Build the halo-padded array.  Returns (padded, pad_top, pad_left).

    Sides with no contributing strip (global DEM edges) are NOT padded, so
    the array border coincides with the global border and kernels'
    edge rules apply exactly (see kernels/d8.py docstring).
    """
    h, w = core.shape
    slot_map = dict()
    for slot, blob in strips:
        slot_map[slot] = blob
    has_n = 3 in slot_map
    has_s = 7 in slot_map
    has_w = 1 in slot_map
    has_e = 5 in slot_map
    pt, pb = int(has_n), int(has_s)
    pl, pr = int(has_w), int(has_e)
    padded = np.full(
        (h + pt + pb, w + pl + pr), fill_value, dtype=np.dtype(dtype)
    )
    padded[pt : pt + h, pl : pl + w] = core
    dt = np.dtype(dtype)

    def put(slot, ys, xs, sh):
        if slot in slot_map:
            padded[ys, xs] = np.frombuffer(slot_map[slot], dtype=dt).reshape(
                sh
            )

    put(3, slice(0, 1), slice(pl, pl + w), (1, w))
    put(7, slice(pt + h, pt + h + 1), slice(pl, pl + w), (1, w))
    put(1, slice(pt, pt + h), slice(0, 1), (h, 1))
    put(5, slice(pt, pt + h), slice(pl + w, pl + w + 1), (h, 1))
    if pt and pl:
        put(2, slice(0, 1), slice(0, 1), (1, 1))
    if pt and pr:
        put(4, slice(0, 1), slice(pl + w, pl + w + 1), (1, 1))
    if pb and pr:
        put(6, slice(pt + h, pt + h + 1), slice(pl + w, pl + w + 1), (1, 1))
    if pb and pl:
        put(8, slice(pt + h, pt + h + 1), slice(0, 1), (1, 1))
    return padded, pt, pl


def _jvm_halo_strips(df: DataFrame, meta: RasterMeta) -> DataFrame:
    """Strip table (receiver tile, slot, strip) from carried border-strip
    columns — pure JVM codegen: one scan of the small strip columns, one
    explode; the tile blobs are never read and no Python stage runs.
    Matches :func:`_emit_halo_strips` piece-for-piece: N/S rows are the
    carried strips, corners are single-element binary substrings."""
    isz = np.dtype(meta.dtype).itemsize
    ntx, nty = meta.ntiles_x, meta.ntiles_y

    def first(col: str):
        return F.expr(f"substring({col}, 1, {isz})")

    def last(col: str):
        return F.expr(f"substring({col}, (width - 1) * {isz} + 1, {isz})")

    # (slot, dx, dy, piece): receiver = me + (dx, dy); slot = position of
    # my piece relative to the receiver (reference D8 numbering)
    entries = [
        (3, 0, 1, F.col("hs_s")),
        (7, 0, -1, F.col("hs_n")),
        (1, 1, 0, F.col("hs_e")),
        (5, -1, 0, F.col("hs_w")),
        (2, 1, 1, last("hs_s")),
        (4, -1, 1, first("hs_s")),
        (8, 1, -1, last("hs_n")),
        (6, -1, -1, first("hs_n")),
    ]
    pieces = F.array(*[
        F.struct(
            (F.col("tile_x") + dx).alias("tile_x"),
            (F.col("tile_y") + dy).alias("tile_y"),
            F.lit(slot).alias("slot"),
            strip.alias("strip"),
        )
        for slot, dx, dy, strip in entries
    ])
    return (
        df.select(F.explode(pieces).alias("p"))
        .select("p.tile_x", "p.tile_y", "p.slot", "p.strip")
        .where(
            (F.col("tile_x") >= 0) & (F.col("tile_x") < ntx)
            & (F.col("tile_y") >= 0) & (F.col("tile_y") < nty)
        )
    )


def halo_join(tr: TiledRaster) -> DataFrame:
    """Tile rows augmented with a ``halo`` array column of (slot, strip)
    structs.  ONE shuffle of O(perimeter) strip data; the tile interiors
    NEVER shuffle, by either of two mechanisms:

    * under ``HALO_BROADCAST_MAX_BYTES`` of packed strips, the strip
      side is broadcast (Catalyst has no stats for the aggregated strips
      and would otherwise pick a SortMergeJoin that exchanges every tile
      blob — the dominant hidden cost of every focal op);
    * above it — the 100 TB regime, where 10^6 tiles of packed strips
      run to tens of GB — the join relies on CO-PARTITIONING: the strip
      groupBy lands on ``hash(tile_x, tile_y)`` at the canonical count,
      and every tile table in the engine carries the SAME partitioning
      (creation/ingest via :func:`copartition_tiles`, persistence via
      :func:`write_raster_table` bucketing; per-tile mapInPandas ops
      preserve it), so the sort-merge join plans ZERO exchange on the
      tile-blob side.  tests/test_halo_plan.py asserts this.
    """
    meta = tr.meta
    if set(HALO_STRIP_COLS).issubset(tr.df.columns):
        strips = _jvm_halo_strips(tr.df, meta)
    else:
        strips = tr.df.mapInPandas(_emit_halo_strips(tr.meta), _HALO_SCHEMA)
    packed = strips.groupBy("tile_x", "tile_y").agg(
        F.collect_list(F.struct("slot", "strip")).alias("halo")
    )
    # strips ~= 2 rings of perimeter cells at 8B + struct overhead
    perim_bytes = (
        meta.ntiles_x * meta.ntiles_y * 2 * (meta.tile_w + meta.tile_h)
        * 8 * 4
    )
    if perim_bytes <= HALO_BROADCAST_MAX_BYTES:
        packed = F.broadcast(packed)
    return tr.df.join(packed, ["tile_x", "tile_y"], "left")


PIECE_SCHEMA = StructType(
    [
        StructField("tile_x", IntegerType(), False),
        StructField("tile_y", IntegerType(), False),
        StructField("py", IntegerType(), False),   # paste offset in tile
        StructField("px", IntegerType(), False),
        StructField("ph", IntegerType(), False),   # piece dims
        StructField("pw", IntegerType(), False),
        StructField("data", BinaryType(), False),
    ]
)


def assemble_pieces(
    pieces: DataFrame, meta: RasterMeta, fill: float = 0.0
) -> TiledRaster:
    """Distributed re-layout: paste sub-array pieces (PIECE_SCHEMA rows,
    keyed by destination tile) into fresh tiles — one shuffle on the
    destination tile key, no driver gather.  Serves flips/crops/shifts
    whose destination tile grid doesn't align with the source tiles."""
    dt = meta.dtype
    tw, th = meta.tile_w, meta.tile_h
    W, H = meta.width, meta.height
    nodata = meta.nodata

    def paste(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        tw_t = min(tw, W - tx * tw)
        th_t = min(th, H - ty * th)
        out = np.full((th_t, tw_t), fill, dtype=np.dtype(dt))
        for r in pdf.itertuples():
            a = unpack(r.data, r.ph, r.pw, dt)
            out[r.py : r.py + r.ph, r.px : r.px + r.pw] = a
        return pd.DataFrame(
            {
                "tile_x": [tx], "tile_y": [ty],
                "width": [tw_t], "height": [th_t],
                "dtype": [dt], "nodata": [nodata],
                "data": [pack(out)],
            }
        )

    out_df = pieces.groupBy("tile_x", "tile_y").applyInPandas(
        paste, TILE_SCHEMA
    )
    return TiledRaster(out_df, meta)
