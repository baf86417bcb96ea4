"""Embedding-column operators: similarity search and near-dup detection
over ``array<float>`` columns (training-data pipeline surface).

Brute-force paths use JVM-side higher-order functions (zip_with +
aggregate) — no Python in the hot loop; the LSH-bucketed variant is the
100TB scale path (candidates only within a bucket)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk(
    df: DataFrame,
    probe_ids,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbours for a probe set: broadcast the probes
    against the full table, window-rank per probe.  The brute-force
    baseline for ANN."""
    probes = df.where(F.col(id_col).isin(list(probe_ids))).select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pvec")
    )
    cand = df.select(F.col(id_col).alias("cand_id"),
                     F.col(vec_col).alias("cvec"))
    sims = (
        cand.crossJoin(F.broadcast(probes))
        .where(F.col("cand_id") != F.col("probe_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("pvec"), F.col("cvec"))
                / (_norm(F.col("pvec")) * _norm(F.col("cvec"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cosine"), F.asc("cand_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "cand_id", "rank", "cosine")
    )


def lsh_buckets(
    df: DataFrame,
    planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-LSH bucket per vector using deterministic difference
    hyperplanes (sign of e[2i+1]-e[2i+2]) — reproducible in plain SQL.
    Near-dup candidates share a bucket; at scale the candidate join is
    bucket-local instead of all-pairs."""
    bucket = F.lit(0).cast("long")
    for i in range(planes):
        bit = F.when(
            F.element_at(F.col(vec_col), 2 * i + 1)
            > F.element_at(F.col(vec_col), 2 * i + 2),
            1,
        ).otherwise(0)
        bucket = bucket + (bit.cast("long") * F.lit(2 ** i))
    return df.select(F.col(id_col), bucket.alias("bucket"))


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.99,
    planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicates via LSH bucketing + in-bucket
    exact cosine."""
    b = lsh_buckets(df, planes, id_col, vec_col)
    vecs = df.join(b, id_col)
    left = vecs.select(F.col(id_col).alias("a"), F.col(vec_col)
                       .alias("va"), "bucket")
    right = vecs.select(F.col(id_col).alias("b"), F.col(vec_col)
                        .alias("vb"), "bucket")
    return (
        left.join(right, "bucket")
        .where(F.col("a") < F.col("b"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("va"), F.col("vb"))
                / (_norm(F.col("va")) * _norm(F.col("vb"))),
                6,
            ),
        )
        .where(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
