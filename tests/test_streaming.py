"""Structured Streaming: incremental rasterization equals the batch
aggregate on the same input (availableNow trigger)."""

import tempfile

from pyspark.sql import functions as F

from richdem_spark.streaming import (
    read_webtext_stream,
    streaming_cell_counts,
)
from richdem_spark.webtext import geocode, synth_webtext


def test_streaming_counts_match_batch(spark):
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/pages"
        pages = synth_webtext(spark, 2000, seed=11, partitions=4)
        pages.write.parquet(src)

        stream = read_webtext_stream(spark, src, max_files_per_trigger=2)
        counts = streaming_cell_counts(stream, grid=64, window="1 hour",
                                       watermark="2 hours")
        q = (
            counts.writeStream.outputMode("append")
            .format("memory")
            .queryName("cells_stream")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

        got = spark.sql(
            "select window_start, gx, gy, n_pages from cells_stream"
        )
        batch = (
            geocode(spark.read.parquet(src))
            .groupBy(
                F.window("warc_ts", "1 hour").alias("win"),
                F.least(F.greatest(F.floor((F.col("lon") + 180.0) / 360.0
                                           * 64).cast("long"), F.lit(0)),
                        F.lit(63)).alias("gx"),
                F.least(F.greatest(F.floor((90.0 - F.col("lat")) / 180.0
                                           * 64).cast("long"), F.lit(0)),
                        F.lit(63)).alias("gy"),
            )
            .agg(F.count(F.lit(1)).alias("n_pages"))
            .select(F.col("win.start").alias("window_start"), "gx", "gy",
                    "n_pages")
        )
        a = {tuple(r) for r in got.collect()}
        b = {tuple(r) for r in batch.collect()}
        # append-mode semantics: windows still inside the watermark
        # horizon when the stream ends are (correctly) not yet emitted
        assert a <= b
        missing = b - a
        if missing:
            import datetime as dt

            max_ts = max(r[0] for r in b)
            horizon = max_ts - dt.timedelta(hours=3)
            assert all(r[0] >= horizon for r in missing)
        assert len(a) > 0


def test_streaming_dedup_exact(spark):
    """Streaming dedup keeps one row per content key (bounded state via
    dropDuplicatesWithinWatermark) — duplicated pages collapse."""
    import tempfile

    from richdem_spark.streaming import streaming_dedup_exact

    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/pages"
        pages = synth_webtext(spark, 600, seed=3, partitions=2)
        # duplicate every page once (same text, later timestamp)
        dups = pages.withColumn(
            "warc_ts",
            F.col("warc_ts") + F.expr("INTERVAL 10 MINUTES"),
        ).withColumn("url", F.concat(F.col("url"), F.lit("?mirror")))
        pages.unionByName(dups).write.parquet(src)

        stream = read_webtext_stream(spark, src, max_files_per_trigger=64)
        deduped = streaming_dedup_exact(stream, watermark="2 hours")
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName("dedup_stream")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

        got = spark.sql("select content_h from dedup_stream")
        n_keys = (spark.read.parquet(src)
                  .select(F.md5(F.concat_ws("\x00", "text")))
                  .distinct().count())
        assert got.count() == n_keys
        assert got.distinct().count() == n_keys


def test_streaming_quality_monitor(spark):
    import tempfile

    from richdem_spark.streaming import streaming_quality_monitor

    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/pages"
        synth_webtext(spark, 500, seed=5, partitions=2).write.parquet(src)
        stream = read_webtext_stream(spark, src)
        mon = streaming_quality_monitor(stream, window="1 hour")
        q = (
            mon.writeStream.outputMode("append")
            .format("memory")
            .queryName("quality_stream")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        rows = spark.sql(
            "select * from quality_stream").collect()
        assert rows
        total = sum(r.n_pages for r in rows)
        # pages arriving after the watermark passed their window are
        # dropped by design; the loss must be marginal at this horizon
        assert 475 <= total <= 500
        assert all(r.mean_len >= 0 for r in rows)


def test_streaming_bucketed_upsert_equals_batch(spark):
    """foreachBatch upsert into the bucketed tile table: after the
    stream drains (multiple micro-batches), the catalog table is
    cell-for-cell identical to batch rasterize_pages on the same pages,
    and reads back through read_raster_table with intact metadata."""
    import numpy as np

    from richdem_spark.streaming import (
        run_incremental_rasterization_bucketed,
    )
    from richdem_spark.tiles import read_raster_table
    from richdem_spark.webtext import geocode, rasterize_pages

    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/pages"
        pages = synth_webtext(spark, 3000, seed=19, partitions=4)
        pages.write.parquet(src)

        table = "stream_raster_upsert"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        spark.sql(f"DROP TABLE IF EXISTS {table}__stage")
        run_incremental_rasterization_bucketed(
            spark, src, table, f"{d}/ckpt", grid=64, tile=16,
            max_files_per_trigger=1,   # force multiple micro-batches
        )

        got = read_raster_table(spark, table)
        want = rasterize_pages(
            geocode(spark.read.parquet(src)), grid=64, tile=16,
            value="count")
        assert got.meta.width == 64 and got.meta.tile_w == 16
        np.testing.assert_array_equal(got.to_array(), want.to_array())
        spark.sql(f"DROP TABLE IF EXISTS {table}")
