"""F-floor forensics: decompose the per-superstep fixed constant.

BENCH/DECOMPOSITION.md fits median_step_wall ≈ F + c·E/N with
F ≈ 0.9 s, graph-size-independent, and attributes it to "per-superstep
scheduling + V-row state materialization" after the AQE probe
(scripts/fixed_overhead_probe.py) cleared adaptive execution
(~0.14 s). This script measures the remaining attribution instead of
arguing it, by running THREE superstep bodies through the SAME
iteration driver (`run_supersteps` — eager localCheckpoint, explicit
previous-block free) in one process per level:

  tiny  — identity projection over a 1,000-row state: the pure
          driver floor (py4j round-trips, job submission, task
          scheduling, localCheckpoint bookkeeping). No data path.
  vstate — identity projection over the REAL V-row rank state: adds
          the V-sized materialization (compute + block write) F pays
          every superstep even with zero joins.
  real  — the production PageRank superstep on the same plan context:
          F + W/N.

Readout per level: F_floor = vstate median; the part of F the plan
could ever win back by restructuring exchanges ≈ (real − c·E/N) −
vstate, where the first term is F from the two-size fit. If
vstate ≈ F, the constant is the iteration harness + state
materialization itself and no join/exchange restructuring can reduce
it; optimization effort belongs on W (the data path) or on amortizing
F over bigger graphs — exactly the regime the north-star 10⁹-edge
graph lives in (F/T < 2 %).

Protocol hygiene matches pair_run: fresh subprocess per level, same
cached bench graph, warm-up before timing, per-cell hypervisor steal.

Usage:
  python scripts/noop_step_forensics.py            # levels 2, 8
  python scripts/noop_step_forensics.py 2 8 32
Child: python scripts/noop_step_forensics.py --cell <cores> <path>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

STEPS = 8
N_FILES = int(os.environ.get("SPARK_GRAFT_BENCH_FILES", "2000000"))


def _walls(spark, state, step, warm: int = 2, timed: int = STEPS) -> list[float]:
    from simdgraphprocessing_spark.iteration import run_supersteps

    res = run_supersteps(spark, state, step, max_iterations=warm + timed)
    walls = sorted(m["wall_sec"] for m in res.metrics[warm:])
    res.state.unpersist()
    return walls


def cell_main(cores: int, edges_path: str) -> None:
    c0 = bench._read_cpu_stat()
    spark = bench._session(cores, edges_path)
    from pyspark.sql import functions as F

    from simdgraphprocessing_spark.algorithms import pagerank
    from simdgraphprocessing_spark.algorithms.pagerank import build_shuffle_plan

    edges = spark.read.parquet(edges_path).persist()
    n_edges = edges.count()
    plan = build_shuffle_plan(edges)

    def identity_step(state, k):
        return state.select(state.columns), {}

    # tiny: pure driver floor — 1,000 rows, same schema as the rank state
    tiny0 = spark.range(1000).select(
        F.col("id"), F.lit(1e-3).alias("rank"), F.lit(1).alias("outdeg")
    )
    tiny = _walls(spark, tiny0, identity_step)

    # vstate: V-row identity — the state materialization term of F
    v0 = plan.vtab.select("id", F.lit(1.0 / plan.n).alias("rank"), "outdeg")
    vstate = _walls(spark, v0, identity_step)

    # real: the production superstep on the same prepared plan
    pagerank(edges, max_iterations=2, tol=0.0, plan=plan)  # JIT warm-up
    res = pagerank(edges, max_iterations=STEPS, tol=0.0, plan=plan)
    real = sorted(m["wall_sec"] for m in res.metrics)
    plan.close()

    out = {
        "cores": cores,
        "edge_rows": n_edges,
        "v_rows": plan.n,
        "tiny_median": tiny[len(tiny) // 2],
        "tiny_min": tiny[0],
        "vstate_median": vstate[len(vstate) // 2],
        "vstate_min": vstate[0],
        "real_median": real[len(real) // 2],
        "real_min": real[0],
    }
    out.update(bench._steal_pct(c0, bench._read_cpu_stat()))
    spark.stop()
    print(json.dumps(out))


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [2, 8]
    spark = bench._session(32)
    path, _etl = bench.build_bench_graph(spark, N_FILES)
    spark.stop()
    time.sleep(1)
    for cores in levels:
        cmd = [sys.executable, os.path.abspath(__file__), "--cell", str(cores), path]
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
        if out.returncode != 0:
            print(f"cell {cores} FAILED: {out.stderr[-800:]}", file=sys.stderr)
            continue
        cell = json.loads(out.stdout.strip().splitlines()[-1])
        print(json.dumps(cell), flush=True)
        resid = round(cell["real_median"] - cell["vstate_median"], 3)
        print(
            f"local[{cores}]: driver floor {cell['tiny_median']:.3f}s, "
            f"+V-state {cell['vstate_median']:.3f}s, real step "
            f"{cell['real_median']:.3f}s -> data-path (W/N + exchange "
            f"overhead) {resid:.3f}s, steal {cell.get('steal_pct')}%",
            flush=True,
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--cell":
        cell_main(int(sys.argv[2]), sys.argv[3])
    else:
        main()
