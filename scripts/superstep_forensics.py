"""Per-superstep forensics: wall vs JVM-CPU vs IO vs shm growth.

The dual-estimator pair at 2->8 on the 8M-file graph shows superstep
walls spreading 22s -> 49s within one run at ~0% hypervisor steal and
<2s total GC pause — so WHERE does the extra wall go? Each measured
superstep here prints, in ORDER:

  wall_s       wall between consecutive step entries (= one full
               superstep including its localCheckpoint materialization)
  jvm_cpu_s    utime+stime delta of the local-mode JVM (all threads)
  occ          jvm_cpu_s / (wall_s * cores) — worker-thread occupancy;
               flat cpu with rising wall = external contention,
               rising cpu with wall = internal work (GC concurrent
               cycles, recompute, spill)
  rd/wr_mb     JVM /proc/<pid>/io deltas
  shm_mb       /dev/shm/spark-tmp usage at the sample (shuffle backlog
               the ContextCleaner hasn't reaped yet)
  steal%       hypervisor steal share during the step

Usage: python scripts/superstep_forensics.py [cores] [edges_path] [warm] [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses _session / BENCH_CONF: identical conf to the pair runs)
import simdgraphprocessing_spark.iteration as iteration  # noqa: E402


def _java_pid(spark=None) -> int:
    """Pid of THIS session's local-mode JVM.

    Derived from the py4j gateway child process when a session is
    given (never attributes a concurrent, unrelated Spark JVM's
    CPU/IO to these samples); falls back to the NEWEST matching java
    process, with a clear error instead of a bare int('') ValueError
    when no JVM is up."""
    if spark is not None:
        proc = getattr(spark.sparkContext._gateway, "proc", None)
        if proc is not None and proc.pid:
            return int(proc.pid)
    import subprocess

    # list-form exec (no shell): a shell's own cmdline would contain
    # the pattern and pgrep -n would return the shell itself
    out = subprocess.run(
        ["pgrep", "-n", "-f", "java.*pyspark"], capture_output=True, text=True
    ).stdout.strip()
    if not out:
        raise RuntimeError(
            "no pyspark JVM found (is the SparkSession up?) — "
            "pgrep -f 'java.*pyspark' matched nothing"
        )
    return int(out)


def _proc_cpu_s(pid: int) -> float:
    parts = open(f"/proc/{pid}/stat").read().split()
    hz = os.sysconf("SC_CLK_TCK")
    return (int(parts[13]) + int(parts[14])) / hz


def _proc_io(pid: int) -> tuple[int, int]:
    rd = wr = 0
    for line in open(f"/proc/{pid}/io"):
        if line.startswith("read_bytes"):
            rd = int(line.split()[1])
        elif line.startswith("write_bytes"):
            wr = int(line.split()[1])
    return rd, wr


def _shm_mb() -> float:
    total = 0
    for root, _d, files in os.walk("/dev/shm/spark-tmp"):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total / 1e6


class Sampler:
    def __init__(self, pid: int, cores: int):
        self.pid, self.cores = pid, cores
        self.prev = None

    def sample(self, label: str):
        cur = {
            "t": time.time(),
            "cpu": _proc_cpu_s(self.pid),
            "io": _proc_io(self.pid),
            "stat": bench._read_cpu_stat(),
            "shm": _shm_mb(),
        }
        if self.prev is not None:
            p = self.prev
            wall = cur["t"] - p["t"]
            dcpu = cur["cpu"] - p["cpu"]
            steal = bench._steal_pct(p["stat"], cur["stat"])
            print(
                f"{label:>10}  wall={wall:6.1f}  jvm_cpu={dcpu:7.1f}  "
                f"occ={dcpu/(wall*self.cores):5.2f}  "
                f"rd_mb={(cur['io'][0]-p['io'][0])/1e6:6.0f}  "
                f"wr_mb={(cur['io'][1]-p['io'][1])/1e6:6.0f}  "
                f"shm_mb={cur['shm']:7.0f}  steal={steal['steal_pct']:4.1f}  "
                f"idle={steal['idle_pct']:4.1f}",
                flush=True,
            )
        self.prev = cur


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    edges_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(bench.CACHE, "edges_n8000000")
    )
    warm = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    from simdgraphprocessing_spark.algorithms import pagerank

    spark = bench._session(cores, edges_path)
    edges = spark.read.parquet(edges_path).persist()
    n_edges = edges.count()
    pid = _java_pid(spark)
    print(f"# cores={cores} edges={n_edges} jvm_pid={pid}", flush=True)

    sampler = Sampler(pid, cores)

    # wrap run_supersteps so every step ENTRY takes a sample — the
    # delta between consecutive entries is one full superstep
    orig = iteration.run_supersteps

    def instrumented(spark_, init, step, **kw):
        def wrapped(state, k):
            sampler.sample(f"step{k}")
            return step(state, k)

        return orig(spark_, init, wrapped, **kw)

    iteration.run_supersteps = instrumented
    # pagerank module imported run_supersteps by name — patch its
    # module globals too (NB: the package attribute `pagerank` shadows
    # the submodule, so `import ...algorithms.pagerank as m` would
    # bind the FUNCTION; go through sys.modules)
    sys.modules["simdgraphprocessing_spark.algorithms.pagerank"].run_supersteps = (
        instrumented
    )

    if warm:
        t0 = time.time()
        pagerank(edges, max_iterations=warm, tol=0.0)
        print(f"# warmup {warm} iters: {time.time()-t0:.1f}s", flush=True)

    for run in range(2):
        sampler.prev = None
        pagerank(edges, max_iterations=iters, tol=0.0)
        sampler.sample(f"run{run}end")
    spark.stop()


if __name__ == "__main__":
    main()
