"""Spatial joins on the shared cell index (north_rule): point-in-polygon
watershed assignment, kNN pour-point matching, raster<->vector pairing.

All joins are **cell-key equi-joins + in-cell refinement**: the big side
(pages) is keyed by spatial-index cell; the small side (polygons / pour
points) is exploded into its covering cells and broadcast.  Skewed cells
(cities) are handled by AQE skew-join plus the salted aggregation in
webtext.rasterize_pages.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from .spatial_index import cell_id, cell_to_xy, lonlat_to_bins  # noqa: F401 (public re-exports)
from .tiles import TiledRaster, unpack


# ---------------------------------------------------------------------------
# point-in-polygon
# ---------------------------------------------------------------------------

def point_in_polygon(px: np.ndarray, py: np.ndarray,
                     ring_x: np.ndarray, ring_y: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray cast: True where (px,py) inside ring."""
    inside = np.zeros(px.shape, dtype=bool)
    n = len(ring_x)
    for i in range(n):
        x1, y1 = ring_x[i], ring_y[i]
        x2, y2 = ring_x[(i + 1) % n], ring_y[(i + 1) % n]
        cond = (y1 > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xin = (x2 - x1) * (py - y1) / (y2 - y1) + x1
        inside ^= cond & (px < xin)
    return inside


def polygon_cover_cells(ring_lon, ring_lat, level: int) -> list[int]:
    """Index cells covering a polygon's bbox (coarse cover; refinement is
    the exact PIP test)."""
    x0, y0 = lonlat_to_bins(min(ring_lon), max(ring_lat), level)
    x1, y1 = lonlat_to_bins(max(ring_lon), min(ring_lat), level)
    out = []
    from .spatial_index import _spread_bits

    for yy in range(int(y0), int(y1) + 1):
        for xx in range(int(x0), int(x1) + 1):
            m = int(_spread_bits(np.array([xx], np.uint64))[0]) | (
                int(_spread_bits(np.array([yy], np.uint64))[0]) << 1
            )
            out.append((level << 58) | m)
    return out


def assign_points_to_polygons(
    points: DataFrame,  # (…, lat, lon)
    polygons: list[dict],  # [{'id': int, 'lon': [...], 'lat': [...]}]
    level: int = 6,
    point_id_col: str = "url",
) -> DataFrame:
    """PIP assignment: broadcast cell->candidate-polygon table, equi-join
    on the point's cell, refine with the exact ray cast in a vectorized
    pandas stage.  Returns (point_id, polygon_id)."""
    spark = points.sparkSession
    cover_rows = []
    for p in polygons:
        for c in polygon_cover_cells(p["lon"], p["lat"], level):
            cover_rows.append((int(np.int64(np.uint64(c) & np.uint64(
                0x7FFFFFFFFFFFFFFF))), int(p["id"])))
    cover = spark.createDataFrame(
        cover_rows, StructType([
            StructField("cell", LongType(), False),
            StructField("polygon_id", IntegerType(), False),
        ])
    )
    polys_b = {int(p["id"]): (np.asarray(p["lon"], float),
                              np.asarray(p["lat"], float))
               for p in polygons}

    @F.pandas_udf(LongType())
    def cell_of(lon: pd.Series, lat: pd.Series) -> pd.Series:
        c = cell_id(lon.to_numpy(), lat.to_numpy(), level)
        return pd.Series((c & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(
            np.int64))

    pts = points.withColumn("cell", cell_of("lon", "lat"))
    cand = pts.join(F.broadcast(cover), "cell")

    schema = StructType([
        StructField("point_id", cand.schema[point_id_col].dataType, False),
        StructField("polygon_id", IntegerType(), False),
    ])
    bpolys = spark.sparkContext.broadcast(polys_b)

    def refine(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pb = bpolys.value
        for pdf in it:
            keep_id, keep_poly = [], []
            for pid, grp in pdf.groupby("polygon_id"):
                lon_r, lat_r = pb[int(pid)]
                ins = point_in_polygon(
                    grp["lon"].to_numpy(), grp["lat"].to_numpy(),
                    lon_r, lat_r,
                )
                keep_id.extend(grp[point_id_col].to_numpy()[ins].tolist())
                keep_poly.extend([int(pid)] * int(ins.sum()))
            yield pd.DataFrame({"point_id": keep_id,
                                "polygon_id": keep_poly})

    return cand.select(point_id_col, "lon", "lat", "polygon_id") \
        .mapInPandas(refine, schema)


# ---------------------------------------------------------------------------
# kNN pour-point matching
# ---------------------------------------------------------------------------

def knn_join(
    points: DataFrame,  # big side: (…, lat, lon)
    sites: list[tuple[int, float, float]],  # (site_id, lat, lon) small side
    k: int = 3,
    point_id_col: str = "url",
) -> DataFrame:
    """k nearest sites per point.  The site table is tiny (pour points =
    depression outlets), so it is broadcast whole and the per-point top-k
    is computed vectorized — the cell-ring expansion variant only pays off
    once |sites| no longer fits an executor broadcast."""
    spark = points.sparkSession
    arr = np.array([(s[1], s[2]) for s in sites], dtype=np.float64)
    ids = np.array([s[0] for s in sites], dtype=np.int64)
    b = spark.sparkContext.broadcast((arr, ids))

    schema = StructType([
        StructField("point_id", points.schema[point_id_col].dataType,
                    False),
        StructField("site_id", LongType(), False),
        StructField("rank", IntegerType(), False),
        StructField("dist_deg", DoubleType(), False),
    ])

    kk = k

    def topk(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sarr, sids = b.value
        for pdf in it:
            lat = pdf["lat"].to_numpy()[:, None]
            lon = pdf["lon"].to_numpy()[:, None]
            d2 = (lat - sarr[None, :, 0]) ** 2 + (
                lon - sarr[None, :, 1]) ** 2
            kuse = min(kk, d2.shape[1])
            rows = {"point_id": [], "site_id": [], "rank": [],
                    "dist_deg": []}
            for r in range(d2.shape[0]):
                # deterministic ties: (distance, site_id) order.  A bare
                # argpartition prefilter is not tie-safe (candidates tied
                # at the k-th distance get picked arbitrarily), so widen
                # it: partition at k, then include EVERY site at <= the
                # k-th distance and lexsort only that candidate set —
                # O(S + C log C) per row instead of O(S log S).
                dr = d2[r]
                if len(dr) > kuse:
                    part = np.argpartition(dr, kuse - 1)
                    kth = dr[part[kuse - 1]]
                    cand = np.flatnonzero(dr <= kth)
                else:
                    cand = np.arange(len(dr))
                order = cand[np.lexsort((sids[cand], dr[cand]))][:kuse]
                for rank, j in enumerate(order):
                    rows["point_id"].append(pdf[point_id_col].iloc[r])
                    rows["site_id"].append(int(sids[j]))
                    rows["rank"].append(rank + 1)
                    rows["dist_deg"].append(float(np.sqrt(d2[r][j])))
            yield pd.DataFrame(rows)

    return points.select(point_id_col, "lat", "lon").mapInPandas(
        topk, schema)


# ---------------------------------------------------------------------------
# raster <-> vector pairing
# ---------------------------------------------------------------------------

def pair_points_with_raster(
    points_geo: DataFrame, tr: TiledRaster, value_name: str = "value"
) -> DataFrame:
    """Join each geocoded point with the raster cell value under it —
    pages⋈DEM pairing on the shared grid.  Equi-join on the tile key; the
    raster side ships one blob per tile."""
    m = tr.meta
    n = m.width
    gx = F.least(F.greatest(F.floor((F.col("lon") + 180.0) / 360.0 * n)
                            .cast("long"), F.lit(0)), F.lit(n - 1))
    gy = F.least(F.greatest(F.floor((90.0 - F.col("lat")) / 180.0 *
                                    m.height).cast("long"), F.lit(0)),
                 F.lit(m.height - 1))
    pts = points_geo.withColumn("gx", gx).withColumn("gy", gy)
    pts = pts.withColumn("tile_x", (F.col("gx") / m.tile_w).cast("int")) \
             .withColumn("tile_y", (F.col("gy") / m.tile_h).cast("int"))
    joined = pts.join(tr.df, ["tile_x", "tile_y"])

    out_fields = [f for f in points_geo.schema.fields]
    schema = StructType(out_fields + [StructField(value_name, DoubleType(),
                                                  True)])
    src_cols = [f.name for f in points_geo.schema.fields]
    tw, th = m.tile_w, m.tile_h

    def sample(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            pdf = pdf.reset_index(drop=True)
            vals = np.empty(len(pdf))
            for (txv, tyv), grp in pdf.groupby(["tile_x", "tile_y"]):
                r0 = grp.iloc[0]
                a = unpack(r0["data"], r0["height"], r0["width"],
                           r0["dtype"])
                lx = grp["gx"].to_numpy() - txv * tw
                ly = grp["gy"].to_numpy() - tyv * th
                vals[grp.index.to_numpy()] = a[ly, lx]
            out = pdf[src_cols].copy()
            out[value_name] = vals
            yield out

    return joined.mapInPandas(sample, schema)


# ---------------------------------------------------------------------------
# kNN at scale: cell-ring expansion (non-broadcastable site tables)
# ---------------------------------------------------------------------------

def knn_join_cells(
    points: DataFrame,            # (…, lat, lon)
    sites: DataFrame,             # (site_id, lat, lon) — may be huge
    k: int = 3,
    level: int = 6,
    rings: tuple = (1, 4, 16),
    point_id_col: str = "url",
    site_id_col: str = "site_id",
) -> DataFrame:
    """k nearest sites per point for site tables too large to broadcast.

    Both sides key by the level-``level`` index cell; sites are exploded
    into all cells within Chebyshev ring R of their own (site padding),
    so a plain cell equi-join yields every candidate within R rings.  A
    point SETTLES when it has >= k candidates whose k-th distance is at
    most R * cell_height — cells beyond ring R are provably farther, so
    the top-k is final.  Unsettled points retry with the next larger R;
    the (tiny) pathological remainder finishes against the full site
    table.  Ties break on (distance, site_id), identical to the
    broadcast ``knn_join``.

    Each ring's ranked/settled/remaining frames are localCheckpointed
    (truncating lineage so ring N does not re-run rings 1..N-1);
    localCheckpoint trades fault tolerance for speed — blocks live on
    executors and are not recomputable — so consume the result
    promptly.  Superseded per-ring state is released as the loop
    advances."""
    cell_h = 180.0 / (1 << level)

    # JVM cell key (no per-row python): replicate cell_id's binning
    n_cells = 1 << level
    bx = F.least(
        F.lit(n_cells - 1),
        F.floor((F.col("lon") + 180.0) / 360.0 * n_cells),
    ).cast("long")
    by = F.least(
        F.lit(n_cells - 1),
        F.floor((F.col("lat") + 90.0) / 180.0 * n_cells),
    ).cast("long")
    # Morton interleave is unnecessary for the equi-join: (bx, by) IS the
    # cell key
    pts = points.select(
        F.col(point_id_col).alias("point_id"), "lat", "lon",
        bx.alias("cx"), by.alias("cy"),
    )
    st = sites.select(
        F.col(site_id_col).alias("site_id"),
        F.col("lat").alias("slat"), F.col("lon").alias("slon"),
        bx.alias("scx"), by.alias("scy"),
    )

    out_parts = []
    remaining = pts
    w_rank = None
    from pyspark.sql.window import Window

    for ring in rings:
        if remaining.isEmpty():
            break
        offs = [(dx, dy) for dx in range(-ring, ring + 1)
                for dy in range(-ring, ring + 1)]
        off_df = remaining.sparkSession.createDataFrame(
            offs, "dx int, dy int")
        padded = (
            st.crossJoin(F.broadcast(off_df))
            .select(
                "site_id", "slat", "slon",
                (F.col("scx") + F.col("dx")).alias("cx"),
                (F.col("scy") + F.col("dy")).alias("cy"),
            )
            .where((F.col("cx") >= 0) & (F.col("cx") < n_cells)
                   & (F.col("cy") >= 0) & (F.col("cy") < n_cells))
        )
        cand = remaining.join(padded, ["cx", "cy"]).withColumn(
            "dist_deg",
            F.sqrt((F.col("lat") - F.col("slat")) ** 2
                   + (F.col("lon") - F.col("slon")) ** 2),
        )
        w_rank = Window.partitionBy("point_id").orderBy(
            "dist_deg", "site_id")
        # each ring's ranked set feeds three consumers (the settled
        # output, the settle test, the anti-join that defines the next
        # ring's input) and the next ring's isEmpty() is an action —
        # without materialization every ring RE-RUNS all previous
        # rings' joins, and the final action re-runs the lot again
        # (guide §1.2).  localCheckpoint pins each ring's small result
        # (<= k rows/point) and truncates the lineage.
        ranked = cand.withColumn("rank", F.row_number().over(w_rank)) \
            .where(F.col("rank") <= k).localCheckpoint(eager=True)
        stats = ranked.groupBy("point_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.max("dist_deg").alias("dk"),
        )
        # Strict inequality: a site exactly at Chebyshev distance
        # ring*cell_h (adjacent cell edge in the latitude direction) can
        # lie just outside the explored rings; at equality a tied site
        # with smaller site_id could be wrongly excluded, violating the
        # (distance, site_id) tie rule of the broadcast knn_join.
        settled_ids = stats.where(
            (F.col("n") >= k) & (F.col("dk") < ring * cell_h)
        ).select("point_id").localCheckpoint(eager=True)
        # NO forced broadcast here: at scale MOST points settle in ring 1,
        # so settled_ids is proportional to the full point table —
        # broadcasting it is an executor-OOM risk at 100 TB.  Left to
        # AQE, these are shuffle joins on point_id (or runtime broadcasts
        # when stats say the side really is small).
        out_parts.append(
            ranked.join(settled_ids, "point_id", "left_semi")
            .select("point_id", "site_id", "rank", "dist_deg")
        )
        prev_remaining = remaining
        remaining = remaining.join(settled_ids, "point_id", "left_anti") \
            .localCheckpoint(eager=True)
        # the new checkpoint truncates lineage, so the superseded ring's
        # remaining blocks can be released (ranked/settled checkpoints
        # must outlive the caller's action and are left pinned — the
        # localCheckpoint durability trade-off, documented above)
        if prev_remaining is not pts:
            prev_remaining.unpersist()

    # pathological remainder: full join (tiny left side by construction)
    if not remaining.isEmpty():
        cand = remaining.crossJoin(
            st.select("site_id", "slat", "slon")
        ).withColumn(
            "dist_deg",
            F.sqrt((F.col("lat") - F.col("slat")) ** 2
                   + (F.col("lon") - F.col("slon")) ** 2),
        )
        w_rank = Window.partitionBy("point_id").orderBy(
            "dist_deg", "site_id")
        out_parts.append(
            cand.withColumn("rank", F.row_number().over(w_rank))
            .where(F.col("rank") <= k)
            .select("point_id", "site_id", "rank", "dist_deg")
        )

    if not out_parts:
        # empty points input: every branch above was skipped
        spark = points.sparkSession
        return spark.createDataFrame(
            [],
            StructType([
                StructField("point_id",
                            points.schema[point_id_col].dataType, True),
                StructField("site_id", LongType(), True),
                StructField("rank", IntegerType(), False),
                StructField("dist_deg", DoubleType(), True),
            ]),
        )
    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.unionByName(p)
    return out
