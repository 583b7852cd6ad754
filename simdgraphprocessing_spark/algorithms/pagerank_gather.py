"""Broadcast-gather PageRank — the second physical strategy.

Same semantics as :func:`~simdgraphprocessing_spark.algorithms.pagerank`
(damping 0.85, uniform dangling redistribution, r_0 = 1/N; pinned by
the same numpy power-iteration oracle), different physical plan:

* the edge table is range-partitioned by ``dst`` ONCE and persisted
  (each partition owns a contiguous dst-id slice, so its accumulator
  is a small L2-resident array);
* each superstep broadcasts the V-sized ``rank/outdeg`` vector
  (8 bytes/vertex — 80 MB at 10^7 vertices) and runs a numpy
  ``bincount`` gather inside ``mapInArrow``: contribution sums for a
  partition's dst slice computed with ZERO per-superstep shuffle;
* the V-row partial result is collected to the driver (Arrow), where
  the damping/dangling update is a numpy one-liner.

This is exactly the reference's execution shape — CSR rows stay put,
a dense rank vector is gathered through them
(``apps/n_path.cpp:58-83`` generalized) — realized with Spark's
broadcast + mapInArrow instead of shared memory.

WHEN TO USE WHICH: this path requires dense vertex ids (degree-rank
relabeled, ``graph.degree_rank_ids``) and a vertex vector that fits
the driver/broadcast (V ≤ ~5·10^7; at 38M-edge bench scale the vector
is 16 MB). Beyond that — the 10^10-vertex north star — use the
shuffle-join implementation, whose per-superstep state never
concentrates anywhere. The cutover is the same decision Spark itself
makes between broadcast-hash and shuffle joins.

MEASURED (38M-edge bench graph, 24g heap): the strategy's wall is
dominated by the per-superstep broadcast fetch + V-row driver collect,
which makes it hostage to driver/host I/O contention in a way the
shuffle plan is not — at a FIXED level and config, local[32] samples
spanned **4.2M–37.8M edges/s/iter within one hour** (best single run
37.2M = ~1.0s/superstep, BENCH/bench_full_r3_run3.json; the round-3
driver bench measured the same configuration at 2.2M while the shuffle
plan did 14.9M in the same phase). The 37.2M peak is real but not
reproducible on demand — and the spread is WITHIN one run, not just
between runs, so even a measured-faster probe sample is unreliable
(round 5 measured probe steps of 1.3s followed by run steps of 13s).
Do NOT pick this strategy on a one-shot measurement: use
:func:`pagerank_auto`, which makes the plan keep earning its slot —
every gather superstep runs under a budget derived from the shuffle
plan's measured walls, and the first over-budget step hands the
remaining supersteps back to the shuffle plan (state carries over, so
nothing is recomputed). The shuffle-join path remains the
unbounded-scale default.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simdgraphprocessing_spark.iteration import IterationResult

MAX_DENSE_VERTICES = 50_000_000


def _sustained_exceeded(walls: list[float], budget_sec: float) -> bool:
    """True when the LOWER median of the post-setup superstep walls
    exceeds the budget. ``walls[0]`` (one-time persist/broadcast setup
    rides on the first step) is excluded, and at least two post-setup
    samples are required, so a single steal burst can never evict —
    the lower median of two samples is the FASTER one. Pure function
    (unit-tested in tests/test_algorithms.py)."""
    post = sorted(walls[1:])
    if len(post) < 2:
        return False
    return post[(len(post) - 1) // 2] > budget_sec


def pagerank_gather(
    edges: DataFrame,
    damping: float = 0.85,
    max_iterations: int = 20,
    tol: float = 1e-10,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    num_partitions: int | None = None,
    initial_ranks: DataFrame | None = None,
    step_timeout_sec: float | None = None,
    sustained_budget_sec: float | None = None,
) -> IterationResult:
    """Returns IterationResult whose state is ``(id, rank)``.

    ``edges``: directed (src, dst) with DENSE ids in [0, V). Raises if
    the id space is too large for the broadcast vector.

    ``initial_ranks``: optional ``(id, rank)`` table to continue from
    (the ``pagerank_auto`` strategy hand-off). Must cover the dense
    id space exactly — a row count != V raises ``ValueError`` (holes
    would silently change N and the dangling mass between plans).

    ``step_timeout_sec``: per-superstep wall budget. A superstep that
    RUNS OVER the budget still completes and its rank update still
    counts (the check happens after the step, so no work is lost),
    but the loop then stops early with ``metrics[-1]["timeout_
    exceeded"] = True`` — ``pagerank_auto``'s mid-run defense against
    this plan's known failure mode (per-superstep broadcast fetch +
    V-row driver collect degrading ~9× under driver I/O contention;
    see the module docstring's measured spread).

    ``sustained_budget_sec``: eviction on the RUNNING lower-median of
    this call's superstep walls, excluding the setup-laden first step
    and requiring ≥2 post-setup samples (one steal burst can never
    evict). Exists because ``step_timeout_sec`` alone is a loose
    catastrophic guard: ``pagerank_auto`` derives it from the shuffle
    probe's MEDIAN, and a contended probe inflates it — round-5 run 6
    at local[8] set a 12.4 s budget off a 9.9 s contended probe wall,
    so 10-12 s gather steps "kept earning the slot" for the whole run
    while the shuffle plan's own best step was 5.8 s. The sustained
    check compares against the shuffle plan's best observed superstep
    instead, which contention can inflate only upward (keeping gather
    longer — safe), never downward.
    """
    spark = edges.sparkSession
    sc = spark.sparkContext
    p = num_partitions or sc.defaultParallelism

    e = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )
    # one-time layout: contiguous dst slices; persisted for all supersteps
    parted = e.repartitionByRange(p, "dst").persist()
    stats = parted.agg(
        F.max("src").alias("ms"), F.max("dst").alias("md"), F.count("*").alias("cnt")
    ).collect()[0]
    if stats["cnt"] == 0:
        empty = spark.createDataFrame([], "id long, rank double")
        return IterationResult(empty, 0, [])
    n = int(max(stats["ms"], stats["md"])) + 1
    if n > MAX_DENSE_VERTICES:
        parted.unpersist()
        raise ValueError(
            f"pagerank_gather needs a dense vertex vector; V={n} exceeds "
            f"{MAX_DENSE_VERTICES} — use pagerank() (shuffle-join path)"
        )

    # outdeg vector on the driver (V rows once, via Arrow — same
    # pandas-free path as the per-superstep collect below)
    deg_tbl = parted.groupBy("src").agg(F.count("*").alias("c")).toArrow()
    outdeg = np.zeros(n, dtype=np.float64)
    outdeg[deg_tbl.column("src").to_numpy(zero_copy_only=False)] = deg_tbl.column(
        "c"
    ).to_numpy(zero_copy_only=False).astype(np.float64)
    # vertices = src ∪ dst; ids with no row at all (holes in a
    # non-dense range) get rank too — harmless, they behave as
    # isolated dangling vertices
    dangling_mask = outdeg == 0.0

    if initial_ranks is not None:
        r_tbl = initial_ranks.select(
            F.col("id").cast("long"), F.col("rank").cast("double")
        ).toArrow()
        if r_tbl.num_rows != n:
            parted.unpersist()
            raise ValueError(
                f"initial_ranks covers {r_tbl.num_rows} vertices but the "
                f"dense id space is {n} — non-dense hand-off would change "
                "N and the dangling mass; use pagerank() instead"
            )
        rank = np.empty(n, dtype=np.float64)
        rank[r_tbl.column("id").to_numpy(zero_copy_only=False)] = r_tbl.column(
            "rank"
        ).to_numpy(zero_copy_only=False)
    else:
        rank = np.full(n, 1.0 / n, dtype=np.float64)
    start_k = 0
    resumed_from = None
    metrics: list[dict] = []
    # walls measured by THIS call only (resume preloads `metrics` with
    # checkpointed history, which must not feed the sustained check)
    walls_run: list[float] = []
    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
        last = _last_complete(checkpoint_dir)
        if last is not None:
            rank = np.load(os.path.join(checkpoint_dir, f"superstep={last}", "rank.npy"))
            with open(os.path.join(checkpoint_dir, f"superstep={last}", "_metrics.json")) as fh:
                metrics = json.load(fh)["history"]
            start_k = last
            resumed_from = last

    out_schema = "id long, msum double"

    k = start_k
    while k < max_iterations:
        t0 = time.time()
        w = np.where(dangling_mask, 0.0, rank / np.where(dangling_mask, 1.0, outdeg))
        bw = sc.broadcast(w)

        def gather(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            wv = bw.value
            srcs, dsts = [], []
            for batch in batches:
                srcs.append(batch.column("src").to_numpy())
                dsts.append(batch.column("dst").to_numpy())
            if not srcs:
                return
            s = np.concatenate(srcs)
            d = np.concatenate(dsts)
            lo = int(d.min())
            acc = np.bincount(d - lo, weights=wv[s], minlength=int(d.max()) - lo + 1)
            nz = np.nonzero(acc)[0]
            yield pa.RecordBatch.from_arrays(
                [pa.array(nz + lo, pa.int64()), pa.array(acc[nz], pa.float64())],
                names=["id", "msum"],
            )

        # The V-row collect is the broadcast strategy's invariant, not
        # an accident: the next superstep's broadcast vector can only
        # be built on the driver, so V doubles must land there each
        # step (that is why this path is capped at MAX_DENSE_VERTICES
        # and the shuffle-join pagerank() is the unbounded-scale
        # default). The collect is already partition-reduced (one
        # bincount row per dst in the gather) and travels as Arrow —
        # no pandas conversion, no row objects.
        tbl = parted.mapInArrow(gather, out_schema).toArrow()
        bw.destroy()

        msum = np.zeros(n, dtype=np.float64)
        # range partitioning makes each dst unique across partitions,
        # but stay robust to boundary duplicates: add, not assign
        np.add.at(
            msum,
            tbl.column("id").to_numpy(zero_copy_only=False),
            tbl.column("msum").to_numpy(zero_copy_only=False),
        )
        dangling = float(rank[dangling_mask].sum())
        new_rank = (1.0 - damping) / n + damping * (msum + dangling / n)
        delta = float(np.abs(new_rank - rank).sum())
        rank = new_rank
        k += 1

        wall = time.time() - t0
        walls_run.append(wall)
        m = {
            "superstep": k,
            "rows": n,
            "wall_sec": round(wall, 4),
            "l1_delta": delta,
            "dangling_mass": dangling,
        }
        metrics.append(m)
        if checkpoint_dir and (k % checkpoint_every == 0 or k == max_iterations):
            d = os.path.join(checkpoint_dir, f"superstep={k}")
            os.makedirs(d, exist_ok=True)
            np.save(os.path.join(d, "rank.npy"), rank)
            with open(os.path.join(d, "_metrics.json"), "w") as fh:
                json.dump({"superstep": k, "history": metrics}, fh)
            # _SUCCESS marker written LAST — torn checkpoints are ignored
            open(os.path.join(d, "_SUCCESS"), "w").close()
        if tol > 0 and delta < tol:
            break
        if step_timeout_sec is not None:
            # the first executed superstep pays one-time costs (the
            # persisted range-partition's first materialization, the
            # broadcast machinery's first fetch) — grant it 2× budget
            budget = step_timeout_sec * (2.0 if k == start_k + 1 else 1.0)
            if wall > budget:
                # the over-budget step already updated `rank`, so it
                # counts; only FUTURE supersteps are surrendered to
                # the caller's fallback plan
                m["timeout_exceeded"] = True
                break
        if sustained_budget_sec is not None and _sustained_exceeded(
            walls_run, sustained_budget_sec
        ):
            m["timeout_exceeded"] = True
            m["sustained_exceeded"] = True
            break

    parted.unpersist()
    import pandas as pd

    state = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n, dtype=np.int64), "rank": rank})
    )
    return IterationResult(state, k, metrics, resumed_from)


def pagerank_auto(
    edges: DataFrame,
    damping: float = 0.85,
    max_iterations: int = 20,
    tol: float = 1e-10,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    probe_iterations: int = 2,
    gather_step_budget_factor: float = 1.25,
    min_gather_amortization_iters: int = 8,
) -> IterationResult:
    """Self-defending strategy pick with ZERO discarded work and a
    mid-run escape hatch.

    Rounds 3-5 measured the gather plan's superstep wall swinging ~9×
    run-to-run at a FIXED level (per-superstep broadcast fetch + V-row
    driver collect compete with whatever else touches driver I/O), so
    a static rule is wrong somewhere AND a one-shot probe is wrong
    somewhere: the round-5 min-of-2-steps probe caught gather's lucky
    mode (1.3 s/step), picked it, then paid 13 s/step for the whole
    run — 67-98 s where the plain shuffle plan took 16-27 s
    (BENCH/bench_full_r5_run{1,2}.json). The fix is structural, not a
    better estimator:

    1. **Every probed superstep is a real superstep.** Phase 1 runs
       ``probe_iterations`` shuffle supersteps; phase 2 hands their
       rank state to the gather plan (``initial_ranks``); a fallback
       hands gather's state back (the power-iteration update is
       state-free, so strategies compose exactly). Probing costs
       nothing but the strategies' own walls.
    2. **Gather must keep earning its slot — against two yardsticks.**
       Phase 2 runs gather for the remainder under (a) a per-superstep
       budget of ``gather_step_budget_factor × median(shuffle probe
       walls)`` (first step gets 2× for one-time persist/broadcast
       costs) and (b) a SUSTAINED budget of ``gather_step_budget_factor
       × min(shuffle probe walls)`` checked on gather's running
       lower-median excluding the first step (≥2 post-setup samples).
       (a) catches a catastrophic step; (b) catches the round-5 run-6
       failure where a contended shuffle probe inflated (a)'s median
       so 10–12 s gather steps stayed "in budget" for a whole run
       whose shuffle best was 5.8 s. Any over-budget step still
       counts — the checks are post-step — but surrenders the
       remaining supersteps to shuffle. Maximum regret: one
       catastrophic superstep, or three sustained-slow ones.
    3. **Gather must have room to pay its entry fee.** Switching plans
       costs real setup regardless of step speed: a dst-range
       repartition+persist of the edge table, an outdeg collect, and
       two V-row rank hand-offs — measured ~20 s (≈5 shuffle
       supersteps) on the 38M-edge bench graph. A run with fewer than
       ``min_gather_amortization_iters`` supersteps remaining after
       the probe cannot recoup that even from infinitely fast gather
       steps, so gather is not attempted at all
       (``strategy_probe["gather_skipped"]`` says why) and the
       shuffle plan — whose own layout is already built and shared —
       runs the remainder. Long convergence runs (tol-driven, 20+
       iterations), where the gather plan's fast mode actually pays,
       clear this gate automatically.

    The decision is logged on the result: ``result.strategy_probe ==
    {"shuffle_min_step_sec", "gather_min_step_sec", "chosen",
    "gather_step_budget_sec", "fallback_superstep"}``; ``chosen`` is
    the plan that ran the steady state ("shuffle" when gather was
    demoted — oversized vertex space, ``gather_min_step_sec`` None —
    or evicted mid-run, with ``fallback_superstep`` marking where).
    ``checkpoint_dir`` is honored in the steady-state shuffle phase
    only (the strategy hand-off makes cross-phase resume numbering
    ambiguous; gather-chosen runs re-run from the probe on restart).
    """
    from simdgraphprocessing_spark.algorithms.pagerank import (
        build_shuffle_plan,
        pagerank as _shuffle,
    )

    probe: dict = {
        "shuffle_min_step_sec": None,
        "gather_min_step_sec": None,
        "chosen": "shuffle",
        "fallback_superstep": None,
    }
    metrics: list[dict] = []
    # the shuffle plan may run twice (probe + post-fallback remainder);
    # build its persisted layout once and share it across both phases
    plan = build_shuffle_plan(edges)

    def _finish(state, done):
        plan.close()
        out = IterationResult(state, done, metrics)
        out.strategy_probe = probe
        return out

    # Phase 1 — shuffle probe (counts toward the run)
    k1 = min(probe_iterations, max_iterations)
    res = _shuffle(edges, damping=damping, max_iterations=k1, tol=tol, plan=plan)
    metrics.extend(res.metrics)
    s_walls = sorted(m["wall_sec"] for m in res.metrics)
    probe["shuffle_min_step_sec"] = s_walls[0]
    probe["shuffle_probe_walls"] = [m["wall_sec"] for m in res.metrics]
    shuffle_med = s_walls[len(s_walls) // 2]
    done = res.iterations
    state = res.state
    converged = tol > 0 and done < k1
    if done >= max_iterations or converged:
        return _finish(state, done)

    # Phase 2 — gather attempt for the remainder, under a per-step
    # budget derived from the shuffle plan's own measured walls —
    # attempted only when enough supersteps remain to amortize the
    # strategy switch's one-time setup (see docstring point 3)
    if max_iterations - done < min_gather_amortization_iters:
        probe["gather_skipped"] = (
            f"remaining {max_iterations - done} supersteps < "
            f"amortization floor {min_gather_amortization_iters}"
        )
        res3 = _shuffle(
            edges,
            damping=damping,
            max_iterations=max_iterations - done,
            tol=tol,
            checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every,
            initial_ranks=state,
            plan=plan,
        )
        for m in res3.metrics:
            metrics.append({**m, "superstep": done + m["superstep"]})
        return _finish(res3.state, done + res3.iterations)

    budget = gather_step_budget_factor * shuffle_med
    probe["gather_step_budget_sec"] = round(budget, 4)
    # the per-step budget above derives from the probe MEDIAN (of 2
    # samples: the slower one), which a contended probe inflates into
    # a slot gather never has to earn — the sustained check compares
    # gather's running lower-median against the shuffle plan's BEST
    # observed superstep instead (see pagerank_gather docstring)
    sustained = gather_step_budget_factor * s_walls[0]
    probe["gather_sustained_budget_sec"] = round(sustained, 4)
    try:
        res_g = pagerank_gather(
            edges,
            damping=damping,
            max_iterations=max_iterations - done,
            tol=tol,
            initial_ranks=state,
            step_timeout_sec=budget,
            sustained_budget_sec=sustained,
        )
        g_walls = [m["wall_sec"] for m in res_g.metrics]
        if g_walls:
            probe["gather_min_step_sec"] = min(g_walls)
            probe["gather_probe_walls"] = g_walls
        for m in res_g.metrics:
            metrics.append({**m, "superstep": done + m["superstep"]})
        state = res_g.state
        done += res_g.iterations
        timed_out = bool(
            res_g.metrics and res_g.metrics[-1].get("timeout_exceeded")
        )
        if not timed_out:
            # gather finished the remainder (or converged) in budget
            probe["chosen"] = "gather"
            return _finish(state, done)
        probe["fallback_superstep"] = done
    except ValueError:
        # V exceeds MAX_DENSE_VERTICES (or a non-dense hand-off) —
        # gather is structurally out; gather_min_step_sec stays None
        pass

    # Phase 3 — shuffle runs the rest from wherever phase 2 left off
    if done < max_iterations:
        res3 = _shuffle(
            edges,
            damping=damping,
            max_iterations=max_iterations - done,
            tol=tol,
            checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every,
            initial_ranks=state,
            plan=plan,
        )
        for m in res3.metrics:
            metrics.append({**m, "superstep": done + m["superstep"]})
        state = res3.state
        done += res3.iterations
    return _finish(state, done)


def _last_complete(checkpoint_dir: str) -> int | None:
    best = None
    for name in os.listdir(checkpoint_dir):
        if not name.startswith("superstep="):
            continue
        d = os.path.join(checkpoint_dir, name)
        if os.path.exists(os.path.join(d, "_SUCCESS")) and os.path.exists(
            os.path.join(d, "rank.npy")
        ):
            kk = int(name.split("=", 1)[1])
            best = kk if best is None else max(best, kk)
    return best
