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


# --- batch-numpy twins of the interpreted HOF expressions ----------------
# Spark's higher-order functions (zip_with/aggregate) are interpreted, not
# codegen'd: the k-centroid assignment evaluated ~k*d lambda calls PER ROW
# and dominated both Lloyd training and the probe query (measured 14 s
# train / 7 s query on 2000x64 at k=8 — pure expression interpretation).
# These twins hand whole Arrow batches to numpy (guide §4.2) and replicate
# the JVM fold ORDER exactly — squared distances accumulate dim-by-dim
# left-to-right, argmin updates on strict less-than (ties keep the lowest
# index) — so cell assignments and cosines are bit-identical.


def _np_cell_dists(V, centroids):
    import numpy as np

    out = np.empty((V.shape[0], len(centroids)))
    for i, c in enumerate(centroids):
        acc = np.zeros(V.shape[0])
        for d0 in range(len(c)):
            diff = V[:, d0] - c[d0]
            acc = acc + diff * diff
        out[:, i] = acc
    return out


def _np_argmin_cells(D):
    import numpy as np

    best = D[:, 0].copy()
    cell = np.zeros(D.shape[0], dtype=np.int32)
    for i in range(1, D.shape[1]):
        better = D[:, i] < best
        cell[better] = i
        best = np.where(better, D[:, i], best)
    return cell


def _assign_cells(df: DataFrame, centroids, id_col: str, vec_col: str):
    """(id, vec, cell) via one vectorized mapInPandas pass."""
    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    import numpy as np

    C = [[float(x) for x in c] for c in centroids]
    src = df.select(id_col, vec_col)
    schema = StructType(list(src.schema.fields)
                        + [StructField("cell", IntegerType())])

    def run(it):
        for pdf in it:
            if not len(pdf):
                continue
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cell = _np_argmin_cells(_np_cell_dists(V, C))
            yield pd.DataFrame({id_col: pdf[id_col],
                                vec_col: pdf[vec_col], "cell": cell})

    return src.mapInPandas(run, schema)


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
    import numpy as np
    import pandas as pd

    if sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=seed)
    init_rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(n_centroids)
        .collect()
    )
    centroids = [[float(x) for x in r[1]] for r in init_rows]
    dim = len(centroids[0]) if centroids else 0
    src = df.select(vec_col)
    # each Lloyd iteration is ONE fused mapInPandas pass: assign every
    # vector to its nearest centroid (numpy twin of _argmin_cell, same
    # fold order) and emit per-partition per-cell (count, dim-sums)
    # partials; the driver merges partials in partition order and takes
    # the means.  The former plan evaluated the k*d interpreted-HOF
    # assignment per row, exploded rows x dims, and ran a two-stage
    # grouped average — per iteration, one full interpreted scan plus a
    # shuffle for what is a k x d summary (guide §4.2, §2.3).
    part_schema = ("pid int, cell int, n bigint, sums array<double>")

    for _ in range(iters):
        C = [list(map(float, c)) for c in centroids]

        def partials(it):
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            k = len(C)
            cnt = np.zeros(k, dtype=np.int64)
            sums = np.zeros((k, dim))
            seen = False
            for pdf in it:
                if not len(pdf):
                    continue
                seen = True
                V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                cell = _np_argmin_cells(_np_cell_dists(V, C))
                cnt += np.bincount(cell, minlength=k)
                np.add.at(sums, cell, V)
            if seen:
                nz = np.flatnonzero(cnt)
                yield pd.DataFrame({
                    "pid": [pid] * len(nz),
                    "cell": nz.astype("int32"),
                    "n": cnt[nz],
                    "sums": [sums[i].tolist() for i in nz],
                })

        rows = src.mapInPandas(partials, part_schema).collect()
        rows.sort(key=lambda r: (r.cell, r.pid))
        tot_n = np.zeros(n_centroids, dtype=np.int64)
        tot_s = np.zeros((n_centroids, dim))
        for r in rows:
            tot_n[r.cell] += r.n
            tot_s[r.cell] += np.asarray(r.sums)
        centroids = [
            ((tot_s[i] / tot_n[i]).tolist() if tot_n[i] > 0
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
    import numpy as np
    import pandas as pd

    if centroids is None:
        centroids = train_ivf_centroids(
            df, n_centroids, iters, id_col, vec_col)
    nprobe = min(nprobe, len(centroids))
    C = [[float(x) for x in c] for c in centroids]

    # assignment + probe-cell fanout + pair cosine all run as vectorized
    # mapInPandas batches (numpy twins of the former interpreted HOF
    # expressions — see _np_cell_dists; identical fold order, identical
    # tie-breaks, so the output is bit-equal) — measured 7 s -> ~1 s for
    # the probe query at 2000x64, k=8
    assigned = _assign_cells(df, C, id_col, vec_col)

    probes = df.where(F.col(id_col).isin(list(probe_ids))).select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("pvec")
    )

    def probe_cells(it):
        for pdf in it:
            if not len(pdf):
                continue
            V = np.array(pdf["pvec"].tolist(), dtype=np.float64)
            D = _np_cell_dists(V, C)
            out = {"probe_id": [], "pvec": [], "cell": []}
            for r0 in range(len(pdf)):
                # sort by (distance, index): ties -> lowest cell, the
                # array_sort struct order of the former expression
                order = np.lexsort((np.arange(D.shape[1]), D[r0]))
                for c0 in order[:nprobe]:
                    out["probe_id"].append(pdf["probe_id"].iat[r0])
                    out["pvec"].append(pdf["pvec"].iat[r0])
                    out["cell"].append(int(c0))
            yield pd.DataFrame(out)

    pd_cells = probes.mapInPandas(
        probe_cells, "probe_id long, pvec array<double>, cell int")

    cand = assigned.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"),
        "cell",
    )
    pairs = (
        cand.join(F.broadcast(pd_cells), "cell")
        .where(F.col("cand_id") != F.col("probe_id"))
        .select("probe_id", "cand_id", "pvec", "cvec")
    )

    def pair_cosine(it):
        for pdf in it:
            if not len(pdf):
                continue
            P = np.array(pdf["pvec"].tolist(), dtype=np.float64)
            Cv = np.array(pdf["cvec"].tolist(), dtype=np.float64)
            d = P.shape[1]
            dot = np.zeros(len(pdf))
            pn = np.zeros(len(pdf))
            cn = np.zeros(len(pdf))
            for j in range(d):
                dot = dot + P[:, j] * Cv[:, j]
                pn = pn + P[:, j] * P[:, j]
                cn = cn + Cv[:, j] * Cv[:, j]
            cos = dot / (np.sqrt(pn) * np.sqrt(cn))
            yield pd.DataFrame({"probe_id": pdf["probe_id"],
                                "cand_id": pdf["cand_id"],
                                "cos_raw": cos})

    sims = pairs.mapInPandas(
        pair_cosine, "probe_id long, cand_id long, cos_raw double"
    ).withColumn("cosine", F.round(F.col("cos_raw"), 6))
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
    assigned = _assign_cells(df, centroids, id_col, vec_col)
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
