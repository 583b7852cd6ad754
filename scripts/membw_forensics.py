"""Measure the box's aggregate DRAM-bandwidth ceiling vs process count.

WHY THIS EXISTS (round-4 VERDICT, next-round item #1): the literal
8→32 PageRank scaling pair has never passed on this sandbox (r4:
0.501 median / 0.443 min-wall) while every low-core pair passes. The
standing explanation — all local[N] levels share ONE box's memory
bus, so a bandwidth-bound superstep stops scaling once enough cores
are busy, whereas a real 4N-executor cluster brings 4N memory
channels — was an argument, not a measurement. This script makes it a
measurement, since the sandbox exposes no PMU/`perf` counters (the
judge-prescribed alternative): a STREAM-style triad (`a = b + c` over
arrays ≫ LLC) is run by P independent PROCESSES (no GIL, no shared
arrays) inside one synchronized window, and the aggregate moved-bytes
per second is reported per P ∈ {1, 2, 4, 8, 16, 32}.

Reading the result: if aggregate GB/s grew ~4× from 8→32 workers the
bus is NOT the limiter and the pagerank pair's failure would need
another explanation; if it grows ~1× the 8→32 ceiling is hardware,
and the maximum efficiency ANY bandwidth-bound job can post on this
box for 8→32 is (bw32/bw8)/4 — directly comparable to the measured
pagerank pair. Low-core pairs (1→4, 2→8) stay below the ceiling,
which is exactly why BASELINE.md's any-4×-pair rule reads them as the
criterion evidence.

Byte accounting uses the STREAM convention for `add`: 24 bytes/element
(read b, read c, write a); write-allocate traffic makes the true
figure ~4/3 higher, identically at every P, so ratios are unaffected.

Usage: python scripts/membw_forensics.py [out_json]
Writes BENCH/membw_ceiling.json (default) and prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (steal accounting only; no Spark started)

N_ELEMS = 1 << 24  # 3 × 128 MiB arrays per worker — far beyond LLC
BYTES_PER_PASS = 24 * N_ELEMS  # STREAM "add" convention
WINDOW_SEC = 4.0
LEVELS = (1, 2, 4, 8, 16, 32)


def _worker(ready, start_ts, stop_ts, results, idx):
    import numpy as np

    a = np.zeros(N_ELEMS, dtype=np.float64)
    b = np.full(N_ELEMS, 1.5, dtype=np.float64)
    c = np.full(N_ELEMS, 2.5, dtype=np.float64)
    np.add(b, c, out=a)  # warm: faults pages, loads TLB
    ready.release()
    while time.time() < start_ts.value:
        time.sleep(0.001)
    passes = 0
    t0 = time.time()
    while time.time() < stop_ts.value:
        np.add(b, c, out=a)
        passes += 1
    results.put((idx, passes, time.time() - t0))


def measure_level(p: int) -> dict:
    ready = mp.Semaphore(0)
    start_ts = mp.Value("d", 0.0)
    stop_ts = mp.Value("d", time.time() + 3600)
    results: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(ready, start_ts, stop_ts, results, i))
        for i in range(p)
    ]
    for pr in procs:
        pr.start()
    for _ in range(p):
        ready.acquire()
    # all workers warmed: open a synchronized window
    now = time.time()
    start_ts.value = now + 0.2
    stop_ts.value = now + 0.2 + WINDOW_SEC
    c0 = bench._read_cpu_stat()
    for pr in procs:
        pr.join()
    steal = bench._steal_pct(c0, bench._read_cpu_stat())
    rows = [results.get() for _ in range(p)]
    per_worker = []
    agg = 0.0
    for _idx, passes, secs in rows:
        gbs = passes * BYTES_PER_PASS / secs / 1e9
        per_worker.append(round(gbs, 2))
        agg += gbs
    return {
        "workers": p,
        "aggregate_gb_per_sec": round(agg, 2),
        "per_worker_gb_per_sec": sorted(per_worker),
        "window_sec": WINDOW_SEC,
        "steal_pct": steal["steal_pct"],
    }


def main():
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "BENCH", "membw_ceiling.json")
    )
    levels = {}
    for p in LEVELS:
        levels[f"p{p}"] = measure_level(p)
        print(
            f"# P={p:3d}  {levels[f'p{p}']['aggregate_gb_per_sec']:8.1f} GB/s  "
            f"steal={levels[f'p{p}']['steal_pct']}%",
            file=sys.stderr, flush=True,
        )

    def bw(p):
        return levels[f"p{p}"]["aggregate_gb_per_sec"]

    out = {
        "what": "aggregate DRAM bandwidth (STREAM add, 24B/elem, independent processes)",
        "n_elems_per_array": N_ELEMS,
        "levels": levels,
        # growth factors (ideal = 4.0 for a 4x pair on independent memory)
        "bw_growth_1_to_4": round(bw(4) / bw(1), 3),
        "bw_growth_2_to_8": round(bw(8) / bw(2), 3),
        "bw_growth_8_to_32": round(bw(32) / bw(8), 3),
        # the ceiling any bandwidth-bound job inherits on THIS box:
        # max achievable N->4N efficiency = growth/4
        "max_bw_bound_efficiency_1_to_4": round(bw(4) / bw(1) / 4, 3),
        "max_bw_bound_efficiency_2_to_8": round(bw(8) / bw(2) / 4, 3),
        "max_bw_bound_efficiency_8_to_32": round(bw(32) / bw(8) / 4, 3),
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
