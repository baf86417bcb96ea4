"""Round-6 measurement harness (guide §1): isolates each headline query
with the noop sink, labels jobs, captures .explain("formatted") plans,
and (with SPARK_GRAFT_EVENTLOG=1) writes a Spark event log so stage-level
time attribution is possible offline.

This file is NOT part of the frozen driver contract (bench.py is); it
exists so optimization claims in OPTIMIZATION_r06.md cite reproducible
numbers.  Usage:

    python bench_extra.py [--plans] [--reps N] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_PAGES = int(os.environ.get("SPARK_GRAFT_PAGES", "200000"))
GRID = int(os.environ.get("SPARK_GRAFT_GRID", "1024"))
TILE = int(os.environ.get("SPARK_GRAFT_TILE", "256"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", action="store_true",
                    help="write .explain('formatted') to plans/r06/")
    ap.add_argument("--plan-suffix", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    from richdem_spark.session import get_spark

    extra = {}
    if os.environ.get("SPARK_GRAFT_EVENTLOG", "0") == "1":
        extra = {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": "file:///tmp/spark-events",
        }
    spark = get_spark(app="richdem_spark_bench_extra",
                      master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS),
                      extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    import __spark_entry__ as em
    from richdem_spark.api import FillDepressions, TerrainAttribute
    from richdem_spark.ops.accum import flow_accumulation_d8_from_elev
    from richdem_spark.webtext import geocode, rasterize_pages, synth_webtext

    qnames = [
        "rasterize_cells", "pip_assign", "knn_sites", "dedup_exact",
        "minhash_lsh_pairs", "ngram_jaccard", "simhash", "cosine_topk",
        "pricing_summary", "top_events_per_user",
    ]
    only = set(args.only.split(",")) if args.only else None
    queries = em.queries()
    out: dict[str, list[float]] = {}

    def timed(name, fn):
        if only is not None and name not in only:
            return None
        sc.setJobDescription(name)
        t0 = time.perf_counter()
        r = fn()
        dt = time.perf_counter() - t0
        out.setdefault(name, []).append(round(dt, 3))
        sc.setJobDescription(None)
        return r

    for rep in range(args.reps):
        # hydrology pipeline, matching bench.py's structure
        if only is None or {"webtext_synth", "rasterize",
                            "rasterize_materialize", "fill_depressions",
                            "fill_materialize", "flow_accumulation",
                            "accum_materialize", "terrain_slope"} & only:
            pages = synth_webtext(spark, N_PAGES).persist()
            timed("webtext_synth", lambda: pages.count())
            geo = geocode(pages)
            dem = timed("rasterize", lambda: rasterize_pages(
                geo, grid=GRID, tile=TILE).persist())
            if dem is None:
                dem = rasterize_pages(geo, grid=GRID, tile=TILE).persist()
            timed("rasterize_materialize", lambda: dem.df.count())
            filled = timed("fill_depressions",
                           lambda: FillDepressions(dem).persist())
            if filled is None:
                filled = FillDepressions(dem).persist()
            timed("fill_materialize", lambda: filled.df.count())
            acc = timed("flow_accumulation",
                        lambda: flow_accumulation_d8_from_elev(filled))
            if acc is not None:
                timed("accum_materialize", lambda: acc.df.count())
            timed("terrain_slope",
                  lambda: TerrainAttribute(filled, "slope_riserun")
                  .df.count())
            pages.unpersist()
            dem.unpersist()
            filled.unpersist()
        for name in qnames:
            timed(name, lambda n=name: noop(queries[n](spark, SF_DIR)))

    if args.plans:
        os.makedirs("plans/r06", exist_ok=True)
        for name in qnames:
            if only is not None and name not in only:
                continue
            df = queries[name](spark, SF_DIR)
            p = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
            with open(f"plans/r06/{name}_{args.plan_suffix}.txt", "w") as f:
                f.write(p)

    mins = {k: min(v) for k, v in out.items()}
    print(json.dumps({"mins": mins, "all": out, "total_min":
                      round(sum(mins.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
