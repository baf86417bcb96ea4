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
    # norms are computed ONCE per row on each side before the cross
    # join: the interpreted aggregate() fold over the vector is the
    # per-row unit of cost here, and inlining _norm in the join output
    # re-evaluated it per (cand, probe) pair — 3 folds per pair instead
    # of 1 (guide §1.2 per-task work).  sqrt(dot(v, v)) is evaluated
    # identically, just earlier, so cosine values are bit-equal.
    probes = df.where(F.col(id_col).isin(list(probe_ids))).select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pvec"),
        _norm(F.col(vec_col)).alias("pnorm"),
    )
    cand = df.select(F.col(id_col).alias("cand_id"),
                     F.col(vec_col).alias("cvec"),
                     _norm(F.col(vec_col)).alias("cnorm"))
    sims = (
        cand.crossJoin(F.broadcast(probes))
        .where(F.col("cand_id") != F.col("probe_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("pvec"), F.col("cvec"))
                / (F.col("pnorm") * F.col("cnorm")),
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


def _centroid_dists(vec_col, centroids):
    """Squared-distance column per centroid (JVM-side zip_with/aggregate
    — whole-stage codegen, no Python)."""
    cols = []
    for c in centroids:
        lit = F.array(*[F.lit(float(x)) for x in c])
        diff = F.zip_with(F.col(vec_col), lit, lambda a, b: (a - b) * (a - b))
        cols.append(F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v))
    return cols


def _argmin_cell(vec_col, centroids):
    """Index of the nearest centroid (ties -> lowest index)."""
    dists = _centroid_dists(vec_col, centroids)
    best = dists[0]
    cell = F.lit(0)
    for i in range(1, len(dists)):
        better = dists[i] < best
        cell = F.when(better, F.lit(i)).otherwise(cell)
        best = F.when(better, dists[i]).otherwise(best)
    return cell


def train_ivf_centroids(
    df: DataFrame,
    n_centroids: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
    seed: int = 42,
) -> list[list[float]]:
    """Deterministic Lloyd's k-means coarse quantizer, expressed as
    DataFrame aggregations (assignment is codegen'd JVM arithmetic; the
    update is a (cell, dim) grouped mean — two shuffles of k*d rows per
    iteration).  Init = the vectors of the ``n_centroids`` smallest ids.

    ``sample_fraction`` is the 100 TB path: the quantizer needs only
    statistical coverage, so Lloyd's iterations run over ONE seeded
    Bernoulli sample taken up front (``iters`` scans of ~0.1 % of the
    table instead of ``iters`` full scans); cell ASSIGNMENT afterwards
    is still a single full scan in the caller.  ``None`` trains on the
    full table (the small-scale / oracle-exact configuration)."""
    if sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=seed)
    init_rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(n_centroids)
        .collect()
    )
    centroids = [[float(x) for x in r[1]] for r in init_rows]
    for _ in range(iters):
        assigned = df.select(
            F.col(vec_col).alias("v"),
            _argmin_cell(vec_col, centroids).alias("cell"),
        )
        rows = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = {}
        for r in rows:
            new.setdefault(int(r.cell), {})[int(r.pos)] = float(r.m)
        centroids = [
            ([new[i][p] for p in sorted(new[i])] if i in new
             else centroids[i])
            for i in range(n_centroids)
        ]
    return centroids


def ivf_topk(
    df: DataFrame,
    probe_ids,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list | None = None,
) -> DataFrame:
    """IVF approximate top-k cosine: coarse-quantize the table once,
    then scan only the ``nprobe`` cells nearest each probe — the scale
    path where brute force reads the whole table, IVF reads
    ~``nprobe / n_centroids`` of it per probe (a partition-pruned scan
    when the table is stored partitioned by cell).

    ``nprobe >= n_centroids`` degenerates to exact brute force (every
    cell probed), which is the DuckDB-oracle-checkable configuration;
    recall at small ``nprobe`` is measured in tests/ against
    :func:`cosine_topk`."""
    if centroids is None:
        centroids = train_ivf_centroids(
            df, n_centroids, iters, id_col, vec_col)
    nprobe = min(nprobe, len(centroids))

    assigned = df.select(
        F.col(id_col), F.col(vec_col),
        _argmin_cell(vec_col, centroids).alias("cell"),
    )
    probes = assigned.where(F.col(id_col).isin(list(probe_ids))).select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pvec")
    )
    # probe -> its nprobe nearest cells (tiny: |probes| x k rows)
    pd_cells = probes.select(
        "probe_id", "pvec",
        F.array(*[
            d.alias(f"d{i}")
            for i, d in enumerate(_centroid_dists("pvec", centroids))
        ]).alias("cd"),
    ).select(
        "probe_id", "pvec",
        F.slice(
            F.transform(
                F.array_sort(
                    F.zip_with(
                        F.col("cd"),
                        F.array(*[F.lit(i) for i in range(len(centroids))]),
                        lambda d, i: F.struct(d.alias("d"), i.alias("i")),
                    )
                ),
                lambda s: s["i"],
            ),
            1, nprobe,
        ).alias("cells"),
    ).select("probe_id", "pvec", F.explode("cells").alias("cell"))

    cand = assigned.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"),
        "cell",
    )
    sims = (
        cand.join(F.broadcast(pd_cells), "cell")
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


def write_ivf_index(
    df: DataFrame,
    path: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index: one full scan assigns every vector to
    its nearest centroid (codegen'd JVM arithmetic), written
    ``partitionBy("cell")`` so probe-time reads are PARTITION-PRUNED —
    a probe touching ``nprobe`` of ``n_centroids`` cells physically
    reads ~``nprobe/n_centroids`` of the table, enforced by the scan's
    PartitionFilters (asserted in tests), not by a post-scan filter."""
    assigned = df.select(
        F.col(id_col), F.col(vec_col),
        _argmin_cell(vec_col, centroids).alias("cell"),
    )
    assigned.write.partitionBy("cell").mode("overwrite").parquet(path)


def _probe_cells(pvec: list[float], centroids, nprobe: int) -> list[int]:
    """Driver-side nearest-``nprobe`` cells for one probe vector (tiny:
    k x d arithmetic; ties -> lowest cell index, matching
    :func:`_argmin_cell` / the array_sort struct order in ivf_topk)."""
    d2 = [
        (sum((a - b) * (a - b) for a, b in zip(pvec, c)), i)
        for i, c in enumerate(centroids)
    ]
    d2.sort()
    return [i for _, i in d2[:nprobe]]


def ivf_topk_from_index(
    spark,
    path: str,
    centroids: list[list[float]],
    probe_ids,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the materialized IVF index with physical partition pruning:
    probe vectors are fetched by id (a small pushed-down lookup), their
    ``nprobe`` nearest cells computed driver-side (|probes| x k x d
    floats), and the candidate scan reads ONLY those cell partitions —
    the plan's PartitionFilters carry ``cell IN (...)``, so at 100 TB
    the probe reads ~nprobe/n_centroids of the stored bytes.  Result ==
    :func:`ivf_topk` with the same centroids/nprobe."""
    idx = spark.read.parquet(path)
    probe_rows = (
        idx.where(F.col(id_col).isin(list(probe_ids)))
        .select(id_col, vec_col).collect()
    )
    pairs = []          # (probe_id, pvec, cell) fanout — tiny, broadcast
    needed: set[int] = set()
    for r in probe_rows:
        pvec = [float(x) for x in r[1]]
        for c in _probe_cells(pvec, centroids, min(nprobe, len(centroids))):
            pairs.append((r[0], pvec, c))
            needed.add(c)
    pd_cells = spark.createDataFrame(
        pairs, "probe_id long, pvec array<double>, cell int"
    )
    cand = idx.where(F.col("cell").isin(sorted(needed))).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cvec"),
        F.col("cell").cast("int").alias("cell"),
    )
    sims = (
        cand.join(F.broadcast(pd_cells), "cell")
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
