"""N-vs-4N scaling-efficiency evidence (BASELINE.md protocol).

Runs the identical hydrology job — synthetic webtext -> geocode ->
rasterize -> Priority-Flood fill -> D8 flow accumulation — at two local
parallelism levels in separate JVMs, checks the outputs are cell-for-cell
identical (the reference's own multi-process harness pattern,
programs/parallel_d8_accum/test_small.sh:36-44), and reports throughput +
scaling efficiency.

Usage: python scale_bench.py [N] [4N]   (defaults 8 and 32)
Prints one JSON line; also usable as a child: `--child <cpus> <outfile>`.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
N_PAGES = int(os.environ.get("SPARK_GRAFT_PAGES", "200000"))
GRID = int(os.environ.get("SPARK_GRAFT_GRID", "2048"))
TILE = int(os.environ.get("SPARK_GRAFT_TILE", "256"))


def run_job(cpus: int, out_npy: str, grid: int = GRID,
            pages: int = N_PAGES) -> dict:
    sys.path.insert(0, REPO)
    import numpy as np

    from richdem_spark.api import FillDepressions, FlowAccumulationFromDirs, FlowDirectionsD8
    from richdem_spark.session import get_spark
    from richdem_spark.webtext import geocode, rasterize_pages, synth_webtext

    spark = get_spark(app=f"scale_bench_{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    pg = synth_webtext(spark, pages).persist()
    pg.count()  # generation excluded from the timed section

    t0 = time.perf_counter()
    dem = rasterize_pages(geocode(pg), grid=grid, tile=TILE).persist()
    dem.df.count()
    pg.unpersist()  # free the page cache before the raster phases
    t_raster = time.perf_counter()
    filled = FillDepressions(dem).persist()
    filled.df.count()
    t_fill = time.perf_counter()
    from richdem_spark.ops.accum import flow_accumulation_d8_from_elev

    # dirs fused into accumulation round 1 (one halo sweep)
    acc = flow_accumulation_d8_from_elev(filled)
    if out_npy:
        arr = acc.to_array()  # full gather only when outputs are compared
        t_acc = time.perf_counter()
        np.save(out_npy, arr)
    else:
        from richdem_spark.ops.focal import aggregate_tiles

        checksum = aggregate_tiles(
            acc, lambda a, nd: float(a.sum()), lambda x, y: x + y, 0.0
        )
        t_acc = time.perf_counter()
        print(f"# weak checksum {checksum}")
    cells = grid * grid
    res = {
        "cpus": cpus,
        "grid": grid,
        "pages": pages,
        "rasterize_s": round(t_raster - t0, 3),
        "fill_s": round(t_fill - t_raster, 3),
        "dirs_accum_s": round(t_acc - t_fill, 3),
        "total_s": round(t_acc - t0, 3),
        "cells": cells,
        "cells_per_sec": round(cells / (t_acc - t0)),
    }
    spark.stop()
    return res


def _child(cpus: int, grid: int, pages: int, out_npy: str):
    p = subprocess.run(
        [sys.executable, __file__, "--child", str(cpus), str(grid),
         str(pages), out_npy],
        capture_output=True, text=True, cwd=REPO,
    )
    line = [ln for ln in p.stdout.splitlines()
            if ln.startswith("CHILD_RESULT ")]
    if not line:
        sys.stderr.write(p.stdout + p.stderr)
        raise SystemExit(f"child {cpus} failed")
    return json.loads(line[0][len("CHILD_RESULT "):])


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--child":
        res = run_job(int(sys.argv[2]), sys.argv[5],
                      grid=int(sys.argv[3]), pages=int(sys.argv[4]))
        print("CHILD_RESULT " + json.dumps(res))
        return

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n4 = int(sys.argv[2]) if len(sys.argv) > 2 else 4 * n
    k = n4 // n

    # strong scaling: identical input at N and 4N; outputs must be
    # cell-for-cell identical (reference harness pattern,
    # programs/parallel_d8_accum/test_small.sh:36-44)
    strong_n = _child(n, GRID, N_PAGES, f"/tmp/scale_strong_{n}.npy")
    strong_n4 = _child(n4, GRID, N_PAGES, f"/tmp/scale_strong_{n4}.npy")
    import numpy as np

    identical = bool(np.array_equal(
        np.load(f"/tmp/scale_strong_{n}.npy"),
        np.load(f"/tmp/scale_strong_{n4}.npy"),
    ))
    strong_speedup = strong_n["total_s"] / strong_n4["total_s"]

    # weak scaling: 4N cores get 4x the cells (2x grid edge) and 4x pages
    # -> throughput efficiency = T_N / T_4N (the 100TB regime: data and
    # executors grow together)
    weak_n4 = _child(n4, GRID * 2, N_PAGES * 4, "")
    weak_eff = strong_n["total_s"] / weak_n4["total_s"]

    print(json.dumps({
        "metric": "hydrology pipeline scaling (rasterize+fill+accum), "
                  f"local[{n}] vs local[{n4}]",
        "strong_N": strong_n,
        "strong_4N": strong_n4,
        "identical_output": identical,
        "strong_speedup": round(strong_speedup, 3),
        "strong_efficiency": round(strong_speedup / k, 3),
        "weak_4N": weak_n4,
        "weak_scaling_efficiency": round(weak_eff, 3),
        "tile": TILE,
    }))


if __name__ == "__main__":
    main()
