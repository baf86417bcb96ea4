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
GRID = int(os.environ.get("SPARK_GRAFT_GRID", "1024"))
TILE = int(os.environ.get("SPARK_GRAFT_TILE", "128"))


def run_job(cpus: int, out_npy: str) -> dict:
    sys.path.insert(0, REPO)
    import numpy as np

    from richdem_spark.api import FillDepressions, FlowAccumulationFromDirs, FlowDirectionsD8
    from richdem_spark.session import get_spark
    from richdem_spark.webtext import geocode, rasterize_pages, synth_webtext

    spark = get_spark(app=f"scale_bench_{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    pages = synth_webtext(spark, N_PAGES).persist()
    pages.count()  # generation excluded from the timed section

    t0 = time.perf_counter()
    dem = rasterize_pages(geocode(pages), grid=GRID, tile=TILE).persist()
    dem.df.count()
    t_raster = time.perf_counter()
    filled = FillDepressions(dem).persist()
    filled.df.count()
    t_fill = time.perf_counter()
    dirs = FlowDirectionsD8(filled).persist()
    dirs.df.count()
    acc = FlowAccumulationFromDirs(dirs)
    arr = acc.to_array()
    t_acc = time.perf_counter()

    np.save(out_npy, arr)
    cells = GRID * GRID
    res = {
        "cpus": cpus,
        "rasterize_s": round(t_raster - t0, 3),
        "fill_s": round(t_fill - t_raster, 3),
        "dirs_accum_s": round(t_acc - t_fill, 3),
        "total_s": round(t_acc - t0, 3),
        "cells": cells,
        "cells_per_sec": round(cells / (t_acc - t0)),
    }
    spark.stop()
    return res


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--child":
        cpus = int(sys.argv[2])
        res = run_job(cpus, sys.argv[3])
        print("CHILD_RESULT " + json.dumps(res))
        return

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n4 = int(sys.argv[2]) if len(sys.argv) > 2 else 4 * n
    results = {}
    outs = {}
    for cpus in (n, n4):
        out_npy = f"/tmp/scale_bench_{cpus}.npy"
        p = subprocess.run(
            [sys.executable, __file__, "--child", str(cpus), out_npy],
            capture_output=True, text=True, cwd=REPO,
        )
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("CHILD_RESULT ")]
        if not line:
            sys.stderr.write(p.stdout + p.stderr)
            raise SystemExit(f"child {cpus} failed")
        results[cpus] = json.loads(line[0][len("CHILD_RESULT "):])
        outs[cpus] = out_npy

    import numpy as np

    a, b = np.load(outs[n]), np.load(outs[n4])
    identical = bool(np.array_equal(a, b))
    tA, tB = results[n]["total_s"], results[n4]["total_s"]
    speedup = tA / tB
    efficiency = speedup / (n4 / n)
    print(json.dumps({
        "metric": "hydrology pipeline scaling (rasterize+fill+accum), "
                  f"local[{n}] vs local[{n4}]",
        "N": results[n],
        "4N": results[n4],
        "identical_output": identical,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "pages": N_PAGES,
        "grid": GRID,
        "tile": TILE,
    }))


if __name__ == "__main__":
    main()
