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

# same bound as ops/fill.py: driver-capacity placement (16 M seam rows
# ≈ low GB against the 24 GB driver); beyond it, executor-solve
import os as _os

DRIVER_SOLVE_MAX_ROWS = int(_os.environ.get(
    "SPARK_GRAFT_DRIVER_SOLVE_MAX", 16_000_000))


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
        driver_max_rows = DRIVER_SOLVE_MAX_ROWS
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
