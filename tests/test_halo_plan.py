"""Plan-shape guarantees for the halo exchange at the 100 TB regime.

Above ``HALO_BROADCAST_MAX_BYTES`` the strip broadcast is off and the
halo join must rely on co-partitioning: every tile table carries the
canonical ``hash(tile_x, tile_y)`` partitioning, so the sort-merge join
plans its ENSURE_REQUIREMENTS exchange ONLY on the O(perimeter) strip
side — tile interiors (the ``data`` blobs) never move.  These tests pin
that plan shape and the fallback path's result equality.
"""

from contextlib import contextmanager

import numpy as np
import pytest

import richdem_spark.tiles as T


@contextmanager
def no_auto_broadcast(spark):
    """Pin the at-scale plan: with huge strip stats Catalyst would never
    auto-broadcast, so turn the threshold off while checking shapes."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _tile_branch(plan: str) -> str:
    """The left (tile-side) child of the first SortMergeJoin: the lines
    between the join node and its second child's Sort."""
    lines = plan.splitlines()
    start = next(i for i, ln in enumerate(lines) if "SortMergeJoin" in ln)
    branch = []
    for ln in lines[start + 1:]:
        if ln.lstrip().startswith("+- Sort"):
            break
        branch.append(ln)
    return "\n".join(branch)


def test_halo_fallback_no_tile_side_exchange(spark, monkeypatch):
    monkeypatch.setattr(T, "HALO_BROADCAST_MAX_BYTES", 0)
    arr = np.arange(144.0).reshape(12, 12)
    tr = T.raster_from_array(spark, arr, tile_w=4, tile_h=4)
    with no_auto_broadcast(spark):
        joined = T.halo_join(tr)
        plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # the ONLY requirement-driven exchange is the strip groupBy; the
    # tile side keeps its canonical partitioning (its single exchange
    # is the creation-time REPARTITION, absent for checkpointed /
    # bucketed tables)
    assert plan.count("ENSURE_REQUIREMENTS") == 1, plan
    assert "ENSURE_REQUIREMENTS" not in _tile_branch(plan), plan


def test_halo_fallback_matches_broadcast_path(spark, monkeypatch):
    rng = np.random.default_rng(7)
    arr = rng.random((13, 11))  # ragged tiling on purpose
    tr = T.raster_from_array(spark, arr, tile_w=4, tile_h=5)

    def collect_halos(df):
        out = {}
        for r in df.collect():
            halo = (sorted((s["slot"], bytes(s["strip"])) for s in r.halo)
                    if r.halo is not None else None)
            out[(r.tile_x, r.tile_y)] = halo
        return out

    want = collect_halos(T.halo_join(tr))
    monkeypatch.setattr(T, "HALO_BROADCAST_MAX_BYTES", 0)
    got = collect_halos(T.halo_join(tr))
    assert got == want


def test_bucketed_table_zero_exchange_tile_side(spark, monkeypatch):
    """write_raster_table -> read_raster_table: the bucketed scan feeds
    the (non-broadcast) halo join with NO exchange at all on the tile
    side — the persistent/Iceberg-shaped substrate."""
    arr = np.arange(96.0).reshape(12, 8)
    tr = T.raster_from_array(spark, arr, tile_w=4, tile_h=4, nodata=-9.0)
    name = "halo_bucket_test"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    try:
        T.write_raster_table(tr, name)
        back = T.read_raster_table(spark, name)
        assert back.meta.nodata == -9.0
        assert back.meta.width == 8 and back.meta.height == 12
        np.testing.assert_array_equal(back.to_array(), arr)

        monkeypatch.setattr(T, "HALO_BROADCAST_MAX_BYTES", 0)
        with no_auto_broadcast(spark):
            joined = T.halo_join(back)
            plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in _tile_branch(plan), plan
        # and the halo contents equal the in-memory raster's
        rows = {(r.tile_x, r.tile_y): r.halo is not None
                for r in joined.collect()}
        assert all(rows.values())
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
