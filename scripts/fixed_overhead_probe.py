"""Fixed-overhead (F) probe: is the per-superstep constant ~0.9 s
(BENCH/DECOMPOSITION.md) reducible by dropping AQE from the
PageRank superstep?

Why suspect AQE: with adaptive execution ON, every exchange in the
superstep becomes an independently materialized query stage — each
one a driver round-trip (submit stage, collect MapOutputStatistics,
re-optimize the remainder). The superstep has three exchanges
(state→src hash, partial-agg→dst hash, contribs→vtab join), so AQE
serializes three per-superstep driver synchronizations that a static
plan pipelines into one job submission. F is graph-size-independent
and charges the HIGH-core level of a scaling pair proportionally more
(F/T is larger where T is smaller), so it is exactly the term that
caps the in-run 2→8 pair at the 2M-file size (model: F=0.9, W=21
s·core → max eff ≈ 0.75).

What AQE buys the superstep: skew-join splitting (the src hash join
over a power-law graph) and nothing else the bench doesn't already
pin (coalescing is off, partition count is fixed at 2×cores). Whether
losing skew splitting costs more than three stage barriers save is an
empirical question — this script answers it.

Protocol (same hygiene as pair_run): fresh subprocess per cell, same
cached input, warm-up + 2×PR_ITERS timed runs, per-superstep walls,
per-cell hypervisor steal. Variants ON/OFF at each requested level.

Usage:
  python scripts/fixed_overhead_probe.py            # levels 2,8
  python scripts/fixed_overhead_probe.py 2 8 32     # explicit levels
Child: python scripts/fixed_overhead_probe.py --cell <cores> <path> <aqe>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (reuses _session/_pinned graph + steal reader)

PR_ITERS = 5
N_FILES = int(os.environ.get("SPARK_GRAFT_BENCH_FILES", "2000000"))


def cell_main(cores: int, edges_path: str, aqe: str) -> None:
    c0 = bench._read_cpu_stat()
    extra = {} if aqe == "on" else {"spark.sql.adaptive.enabled": "false"}
    # _session applies BENCH_CONF + GC pinning; layer the AQE toggle on
    conf_backup = dict(bench.BENCH_CONF)
    bench.BENCH_CONF.update(extra)
    try:
        spark = bench._session(cores, edges_path)
    finally:
        bench.BENCH_CONF.clear()
        bench.BENCH_CONF.update(conf_backup)
    from simdgraphprocessing_spark.algorithms import pagerank

    edges = spark.read.parquet(edges_path).persist()
    n = edges.count()
    pagerank(edges, max_iterations=2, tol=0.0)  # warm-up
    walls: list[float] = []
    for _ in range(2):
        res = pagerank(edges, max_iterations=PR_ITERS, tol=0.0)
        walls.extend(m["wall_sec"] for m in res.metrics)
    walls.sort()
    spark.stop()
    out = {
        "cores": cores,
        "aqe": aqe,
        "edge_rows": n,
        "step_walls": walls,
        "median_step": walls[len(walls) // 2],
        "min_step": walls[0],
    }
    out.update(bench._steal_pct(c0, bench._read_cpu_stat()))
    print(json.dumps(out))


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [2, 8]
    spark = bench._session(32)
    path, _etl = bench.build_bench_graph(spark, N_FILES)
    spark.stop()
    time.sleep(1)
    results = []
    for cores in levels:
        for aqe in ("on", "off"):
            cmd = [
                sys.executable, os.path.abspath(__file__),
                "--cell", str(cores), path, aqe,
            ]
            out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
            if out.returncode != 0:
                print(f"cell {cores}/{aqe} FAILED: {out.stderr[-800:]}", file=sys.stderr)
                continue
            cell = json.loads(out.stdout.strip().splitlines()[-1])
            results.append(cell)
            print(json.dumps(cell), flush=True)
    # pairwise efficiency per variant when both levels of a 4x pair ran
    by = {(c["cores"], c["aqe"]): c for c in results}
    for aqe in ("on", "off"):
        for lo, hi in ((2, 8), (8, 32)):
            a, b = by.get((lo, aqe)), by.get((hi, aqe))
            if a and b:
                eff = (a["median_step"] / b["median_step"]) / (hi // lo)
                effm = (a["min_step"] / b["min_step"]) / (hi // lo)
                print(
                    f"pair {lo}->{hi} aqe={aqe}: eff_median={eff:.3f} "
                    f"eff_minwall={effm:.3f}",
                    flush=True,
                )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--cell":
        cell_main(int(sys.argv[2]), sys.argv[3], sys.argv[4])
    else:
        main()
