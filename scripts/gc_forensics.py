"""Correlate -Xlog:gc* pause records with bench superstep walls.

Usage: python scripts/gc_forensics.py /tmp/gc.log [/tmp/suite.json]

Prints: total GC pause seconds, pause histogram, the 10 longest
pauses with uptime stamps, and (when the suite JSON with
pagerank_step_walls is given) each run's wall distribution — the
question being answered: are the slow supersteps (median ≫ min at
zero steal) G1 stalls, or something else entirely.
"""

from __future__ import annotations

import json
import re
import sys


def parse_pauses(path: str) -> list[tuple[float, float, str]]:
    """(uptime_sec, pause_ms, kind) for every 'Pause' GC record."""
    out = []
    # e.g. [2026-08-18T14:45:12.345+0000][12.345s][info][gc] GC(7)
    #      Pause Young (Normal) (G1 Evacuation Pause) 512M->128M(24576M) 43.210ms
    # Kind is matched NON-GREEDILY up to the heap-transition or the
    # trailing duration, so parenthesis-free records ('Pause Remark
    # 500M->500M(24G) 12.3ms', 'Pause Cleanup ... 1.2ms') keep their
    # kind clean instead of absorbing the heap-size text.
    pat = re.compile(
        r"\[(\d+\.\d+)s\].*?GC\(\d+\)\s+Pause\s+(.+?)\s+"
        r"(?:\d+[KMG]->\d+[KMG]\(\d+[KMG]\)\s+)?(\d+\.\d+)ms\s*$"
    )
    with open(path) as fh:
        for line in fh:
            if " Pause " not in line or "ms" not in line:
                continue
            m = pat.search(line.rstrip())
            if m:
                out.append((float(m.group(1)), float(m.group(3)), m.group(2)))
    return out


def main():
    pauses = parse_pauses(sys.argv[1])
    total = sum(p[1] for p in pauses) / 1000.0
    print(f"GC pauses: n={len(pauses)} total={total:.1f}s")
    buckets = {"<100ms": 0, "100-500ms": 0, "0.5-2s": 0, ">2s": 0}
    for _, ms, _ in pauses:
        if ms < 100:
            buckets["<100ms"] += 1
        elif ms < 500:
            buckets["100-500ms"] += 1
        elif ms < 2000:
            buckets["0.5-2s"] += 1
        else:
            buckets[">2s"] += 1
    print("histogram:", buckets)
    print("10 longest pauses (uptime_s, ms, kind):")
    for t, ms, kind in sorted(pauses, key=lambda p: -p[1])[:10]:
        print(f"  {t:9.1f}s  {ms:9.1f}ms  {kind}")
    if len(sys.argv) > 2:
        # accept both indent-formatted suite artifacts (e.g.
        # BENCH/bench_full_latest.json) and JSONL logs whose LAST line
        # is the suite dict
        with open(sys.argv[2]) as fh:
            body = fh.read()
        try:
            suite = json.loads(body)
        except ValueError:
            suite = json.loads(body.strip().splitlines()[-1])
        walls = suite.get("pagerank_step_walls", [])
        if walls:
            print(
                f"superstep walls (sorted): min={walls[0]:.1f} "
                f"median={walls[len(walls)//2]:.1f} max={walls[-1]:.1f}"
            )
            print("  all:", [round(w, 1) for w in walls])


if __name__ == "__main__":
    main()
