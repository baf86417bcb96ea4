"""Structured Streaming surface: incremental webtext rasterization.

The reference is a batch engine (SURVEY.md §2.11 — no streaming
analogue); this is the engine's native extension for continuously-crawled
pages: ``readStream`` over the webtext table -> geocode -> cell binning ->
watermarked windowed counts -> tile-table upserts via ``foreachBatch``.

At 100 TB the same topology runs against a Kafka/Iceberg-CDC source; the
aggregation state is bounded by (watermark horizon x active cells).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .webtext import WEBTEXT_SCHEMA, geocode


def read_webtext_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    return (
        spark.readStream.schema(WEBTEXT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def streaming_cell_counts(
    pages: DataFrame,
    grid: int = 1024,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked per-window per-cell page counts — the incremental
    rasterization aggregate.  Late pages beyond the watermark are
    dropped; everything stays in JVM codegen (no Python)."""
    geo = geocode(pages)
    n = grid
    gx = F.least(
        F.greatest(F.floor((F.col("lon") + 180.0) / 360.0 * n)
                   .cast("long"), F.lit(0)), F.lit(n - 1))
    gy = F.least(
        F.greatest(F.floor((90.0 - F.col("lat")) / 180.0 * n)
                   .cast("long"), F.lit(0)), F.lit(n - 1))
    return (
        geo.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("win"),
            gx.alias("gx"),
            gy.alias("gy"),
        )
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("win.start").alias("window_start"),
            "gx", "gy", "n_pages",
        )
    )


def streaming_dedup_exact(
    pages: DataFrame,
    watermark: str = "2 hours",
    key_cols: tuple = ("text",),
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Streaming exact dedup: keep the first page per content key within
    the watermark horizon (``dropDuplicatesWithinWatermark`` — state
    bounded by horizon x distinct keys, unlike plain dropDuplicates
    whose state grows forever).  The streaming twin of
    textops.dedup_exact for a continuously-crawled corpus; recrawls and
    mirror fetches inside the horizon collapse to one row.

    The key hashes a JSON-encoded struct of the key columns rather than a
    separator join: ``concat_ws`` silently drops NULLs (so (NULL) and ('')
    collide) and a separator byte inside a value aliases across column
    boundaries — JSON escaping and explicit ``null`` fields rule both
    out."""
    hashed = pages.withColumn(
        "content_h",
        F.md5(F.to_json(F.struct(*[F.col(c) for c in key_cols]),
                        {"ignoreNullFields": "false"})),
    )
    return (
        hashed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_h"])
    )


def streaming_quality_monitor(
    pages: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Windowed corpus-quality telemetry: per language per window, page
    count, mean text length, and blank-page share — the live counterpart
    of the batch quality_score pass; all JVM codegen."""
    return (
        pages.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.avg(F.length("text")).alias("mean_len"),
            F.avg((F.length(F.trim(F.col("text"))) == 0)
                  .cast("double")).alias("blank_share"),
        )
        .select(F.col("win.start").alias("window_start"), "lang",
                "n_pages", "mean_len", "blank_share")
    )


def run_incremental_rasterization(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint: str,
    grid: int = 1024,
) -> None:
    """End-to-end incremental pipeline: stream -> windowed cell counts ->
    append sink; resumable from `checkpoint` (the engine's
    per-partition-state + lineage requirement maps to Structured
    Streaming's offset/state checkpointing)."""
    pages = read_webtext_stream(spark, input_path)
    counts = streaming_cell_counts(pages, grid=grid)
    q = (
        counts.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
