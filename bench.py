"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline set = the BASELINE.md metric surface: webtext rasterization ->
Priority-Flood fill -> D8 accumulation (the hydrology pipeline on a
synthetic webtext DEM), the PIP/kNN spatial joins, and the heaviest
relational/training-data queries.

Measurement protocol (round 3): the whole suite is repeated
$SPARK_GRAFT_REPS times (default 3) inside one Spark session and the
artifact reports the PER-QUERY MINIMUM across reps.  Rationale: the
sandbox is a shared box where neighbour load perturbs individual
measurements 2-6x (both prior rounds recorded such spikes on untouched
code paths), and rep 1 additionally pays JVM/JIT + Python-worker +
Arrow-codepath warm-up.  The minimum is the noise-floor estimate of the
code's actual cost; per-rep totals are also emitted so variance stays
visible.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_PAGES = int(os.environ.get("SPARK_GRAFT_PAGES", "200000"))
GRID = int(os.environ.get("SPARK_GRAFT_GRID", "1024"))
# PROTOCOL FROZEN (round 5): tile=256. The round-5 pinned A/B
# ({r3 5736f9c, r5} x {tile 128, 256} x 2 interleaved cycles x 3 reps,
# pooled per-query minima; BASELINE.md "Bench A/B") measured t256
# FASTER than t128 on current code (20.91 s vs 24.08 s, -13%) — the
# round-4 "t128 ~15% faster" single-shot claim did not replicate.
# Do not change this default without producing the same A/B artifact.
TILE = int(os.environ.get("SPARK_GRAFT_TILE", "256"))
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))


def run_suite(spark) -> dict[str, float]:
    """One full pass over the headline queries; returns per-query secs."""
    import __spark_entry__ as em
    from richdem_spark.api import FillDepressions, TerrainAttribute
    from richdem_spark.ops.accum import flow_accumulation_d8_from_elev
    from richdem_spark.webtext import geocode, rasterize_pages, synth_webtext

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # --- hydrology pipeline on the synthetic webtext table -------------
    pages = synth_webtext(spark, N_PAGES).persist()
    timed("webtext_synth", lambda: pages.count())
    geo = geocode(pages)
    dem = timed(
        "rasterize",
        lambda: rasterize_pages(geo, grid=GRID, tile=TILE).persist(),
    )
    timed("rasterize_materialize", lambda: dem.df.count())
    filled = timed("fill_depressions",
                   lambda: FillDepressions(dem).persist())
    timed("fill_materialize", lambda: filled.df.count())

    # dirs fused into accumulation round 1 (one halo sweep over filled)
    acc = timed("flow_accumulation",
                lambda: flow_accumulation_d8_from_elev(filled))
    timed("accum_materialize", lambda: acc.df.count())
    timed("terrain_slope",
          lambda: TerrainAttribute(filled, "slope_riserun").df.count())

    # --- driver-table queries ------------------------------------------
    queries = em.queries()
    for name in (
        "rasterize_cells", "pip_assign", "knn_sites", "dedup_exact",
        "minhash_lsh_pairs", "ngram_jaccard", "simhash", "cosine_topk",
        "pricing_summary", "top_events_per_user",
    ):
        timed(name, lambda n=name: queries[n](spark, SF_DIR)
              .write.format("noop").mode("overwrite").save())

    pages.unpersist()
    dem.unpersist()
    filled.unpersist()
    return timings


def telemetry_suite(spark) -> dict:
    """Convergence telemetry for the iterative operators (VERDICT r4 #7):
    one pass, NOT repeated — round counts are deterministic for a fixed
    input, so a regression in rounds/inflight between engine rounds is
    visible without paying full-grid iterative runs per rep.  Runs at a
    reduced 256^2 grid: the telemetry is about round structure, not
    throughput (the headline suite owns throughput)."""
    from richdem_spark.api import (
        BreachDepressions,
        FillDepressions,
        FlowAccumulation,
    )
    from richdem_spark.webtext import geocode, rasterize_pages, synth_webtext

    g, t = 256, 64
    pages = synth_webtext(spark, N_PAGES)
    dem = rasterize_pages(geocode(pages), grid=g, tile=t).persist()
    dem.df.count()
    out: dict = {"grid": g, "tile": t}

    t0 = time.perf_counter()
    feps = FillDepressions(dem, epsilon=True).persist()
    feps.df.count()
    out["eps_fill_sec"] = round(time.perf_counter() - t0, 3)

    m: dict = {}
    t0 = time.perf_counter()
    FlowAccumulation(feps, "Quinn", metrics=m).df.count()
    out["mfd_quinn_sec"] = round(time.perf_counter() - t0, 3)
    out["mfd_rounds"] = m.get("rounds")
    out["mfd_inflight_per_round"] = m.get("inflight_per_round")

    m2: dict = {}
    t0 = time.perf_counter()
    BreachDepressions(dem, metrics=m2).df.count()
    out["breach_sec"] = round(time.perf_counter() - t0, 3)
    out["breach_carve_rounds"] = m2.get("carve_rounds")
    out["breach_live_per_round"] = m2.get("carve_live_per_round")

    feps.unpersist()
    dem.unpersist()
    return out


def main() -> None:
    from richdem_spark.session import get_spark

    spark = get_spark(app="richdem_spark_bench", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")

    reps: list[dict[str, float]] = []
    for _ in range(max(1, REPS)):
        reps.append(run_suite(spark))
    # once per invocation (deterministic rounds); A/B sweeps may disable
    telemetry = (telemetry_suite(spark)
                 if os.environ.get("SPARK_GRAFT_TELEMETRY", "1") == "1"
                 else None)

    # per-query minimum across reps = noise-floor estimate
    timings = {
        name: min(r[name] for r in reps) for name in reps[0]
    }
    rep_totals = [round(sum(r.values()), 3) for r in reps]

    total = round(sum(timings.values()), 3)
    # like-for-like comparable vs rounds 1-2 (single cold pass): rep 1
    # pays JVM/JIT + Python-worker + Arrow warm-up, as those rounds did
    cold_total = rep_totals[0]
    cells = GRID * GRID
    hydro = (
        timings["fill_depressions"] + timings["fill_materialize"]
        + timings["flow_accumulation"] + timings["accum_materialize"]
    )
    print(json.dumps({
        "metric": "headline suite wall time (webtext rasterize + "
                  "priority-flood fill + d8 accum + spatial joins + "
                  "training-data ops); per-query min over "
                  f"{len(reps)} reps",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "reps": len(reps),
        "rep_totals": rep_totals,
        "cold_total": cold_total,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cells": cells,
        "pages": N_PAGES,
        "hydrology_cells_per_sec": round(cells / max(hydro, 1e-9)),
        "telemetry": telemetry,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
