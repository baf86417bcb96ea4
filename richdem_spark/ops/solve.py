"""Shared two-level global-solve switch.

Every two-round tiled operator has a tiny global solve over O(perimeter)
seam rows (label graphs, route chains, union-finds) — the reference's
producer rank (programs/parallel_priority_flood/main.cpp:401-547).  The
driver handles it comfortably up to a bound; above the bound the SAME
solve runs as a single-partition executor job so the driver never
materializes O(perimeter) rows (the switch ops/fill.py:330-370 and
ops/accum.py:432-463 introduced, generalized here for every operator).
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

# driver-capacity placement bound: env override wins; otherwise derived
# from the session's actual driver heap at call time (ADVICE r5: the old
# hard-coded 16 M was tuned to this container's 24 GB driver and would
# OOM a typical 1-4 GB production driver in the 2-16 M perimeter range)
import os as _os

DRIVER_SOLVE_MAX_ROWS = (
    int(_os.environ["SPARK_GRAFT_DRIVER_SOLVE_MAX"])
    if "SPARK_GRAFT_DRIVER_SOLVE_MAX" in _os.environ else None
)


def _mem_bytes(s: str) -> int:
    """Parse a Spark memory string: accepts k/m/g/t and kb/mb/gb/tb
    suffixes (JavaUtils.byteStringAs does both); a unitless value is
    MiB, matching how Spark reads driver/executor memory confs."""
    s = str(s).strip().lower()
    units = {"k": 2**10, "m": 2**20, "g": 2**30, "t": 2**40}
    if s.endswith("b"):
        s2 = s[:-1]
        if s2 and s2[-1] in units:
            return int(float(s2[:-1]) * units[s2[-1]])
        return int(float(s2))          # plain bytes: "512b"
    if s and s[-1] in units:
        return int(float(s[:-1]) * units[s[-1]])
    return int(float(s) * 2**20)       # unitless memory conf = MiB


def derived_driver_solve_max(spark) -> int:
    """Perimeter-row budget for the driver-side solve: ~100 B of strip
    and edge payload per perimeter cell, held to ~1/15 of the driver
    heap — ~17 M rows on this sandbox's 24 GB driver (matching the
    measured round-5 bound), ~1.4 M on a 2 GB production default."""
    try:
        mem = spark.conf.get("spark.driver.memory", None)
    except Exception:
        mem = None
    if not mem:
        mem = "2g"
    return max(1_000_000, _mem_bytes(mem) // 1500)


def driver_solve_max(spark, override) -> int:
    """Resolve the bound: explicit/env override (including a test's
    patched 0) wins, else the heap-derived default."""
    return override if override is not None \
        else derived_driver_solve_max(spark)


def two_level_solve(
    df: DataFrame,
    solve_fn: Callable[[list], list[tuple]],
    out_schema,
    est_rows: int,
    driver_max_rows: int | None = None,
) -> DataFrame:
    """Run ``solve_fn(rows) -> list[tuple]`` over the collected rows of
    ``df`` — on the driver when ``est_rows`` is small, else inside a
    single-partition executor job.  Rows arrive as attribute-accessible
    namedtuples either way; the result comes back as a DataFrame with
    ``out_schema``.

    ``driver_max_rows`` defaults to the module constant at CALL time so
    tests can force the executor path by patching it."""
    spark = df.sparkSession
    if driver_max_rows is None:
        driver_max_rows = driver_solve_max(spark, DRIVER_SOLVE_MAX_ROWS)
    if est_rows <= driver_max_rows:
        out = solve_fn(df.collect())
        return spark.createDataFrame(out or [], out_schema)

    cols = [f.name for f in out_schema.fields]

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: list = []
        for pdf in it:
            rows.extend(pdf.itertuples(index=False))
        out = solve_fn(rows)
        if out:
            yield pd.DataFrame(out, columns=cols)

    return df.repartition(1).mapInPandas(run, out_schema)
