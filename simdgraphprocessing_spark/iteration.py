"""Superstep driver with checkpoint/resume — the distributed
generalization of the reference's frontier loop
(``apps/n_path.cpp:58-83``: per-thread buffers → tree merge → global
union → difference → convergence test).

Contract: a superstep is a pure function
``state_df -> (new_state_df, metrics_dict)``. The driver

* persists each new state and truncates lineage (iterative DataFrame
  plans otherwise grow without bound — the classic Spark trap),
* checkpoints vertex state to a partitioned parquet directory
  (Iceberg-style layout ``checkpoint_dir/superstep=K/``) together
  with per-superstep metrics + lineage JSON (``_metrics.json``:
  iteration number, rows, partitioning, wall seconds, custom
  convergence measures),
* resumes from the last *complete* superstep (one whose parquet
  committed its ``_SUCCESS`` marker and metrics file) after a crash —
  ``run()`` with the same ``checkpoint_dir`` just continues.

At 100 TB the state table is large; checkpointing every K supersteps
(``checkpoint_every``) trades recompute for IO exactly like Spark's
own ``localCheckpoint`` policy, but survives driver loss because it
is real parquet, not executor-cached blocks.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

Superstep = Callable[[DataFrame, int], tuple[DataFrame, dict]]


@dataclass
class IterationResult:
    state: DataFrame
    iterations: int
    metrics: list[dict] = field(default_factory=list)
    resumed_from: int | None = None
    # set by strategy-probing wrappers (pagerank_auto): which physical
    # plan ran and the measured probe walls that decided it
    strategy_probe: dict | None = None


def _local_ckpt_jrdd(df: DataFrame):
    """JVM RDD backing a ``localCheckpoint``-ed DataFrame, or None.

    ``DataFrame.unpersist()`` only drops CacheManager entries; the
    blocks behind ``localCheckpoint`` belong to an RDD-level persist
    that the CacheManager never sees, so they linger until the JVM
    garbage-collects the RDD object and the ContextCleaner notices —
    with Spark's default periodic GC that is up to 30 MINUTES. On an
    iterative driver that leaks one V-sized block per superstep:
    measured on an 8M-file graph at local[8], superstep walls degraded
    23s -> 46s while the persisted-RDD count climbed monotonically,
    and snapped back the instant the cleaner ran. Freeing the previous
    superstep's block explicitly keeps walls flat.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            return plan.rdd()
    except Exception:  # py4j surface moved — degrade to cleaner-based GC
        pass
    return None


def _ckpt_path(checkpoint_dir: str, k: int) -> str:
    return os.path.join(checkpoint_dir, f"superstep={k}")


def _metrics_path(checkpoint_dir: str, k: int) -> str:
    return os.path.join(_ckpt_path(checkpoint_dir, k), "_metrics.json")


def last_complete_superstep(checkpoint_dir: str) -> int | None:
    """Largest K with both a parquet _SUCCESS marker and metrics."""
    if not checkpoint_dir or not os.path.isdir(checkpoint_dir):
        return None
    best = None
    for name in os.listdir(checkpoint_dir):
        if not name.startswith("superstep="):
            continue
        k = int(name.split("=", 1)[1])
        d = os.path.join(checkpoint_dir, name)
        if os.path.exists(os.path.join(d, "_SUCCESS")) and os.path.exists(
            os.path.join(d, "_metrics.json")
        ):
            best = k if best is None else max(best, k)
    return best


def run_supersteps(
    spark: SparkSession,
    initial_state: DataFrame,
    step: Superstep,
    max_iterations: int,
    converged: Callable[[dict], bool] | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    state_partitions: int | None = None,
) -> IterationResult:
    """Run ``step`` until convergence / max_iterations, checkpointing.

    ``converged(metrics)`` inspects the metrics dict the step returned
    (e.g. ``{"delta": 1e-7}``) — the driver-side convergence test the
    reference does with ``frontier.cardinality == 0``.
    """
    start_k = 0
    resumed_from = None
    state = initial_state
    metrics_log: list[dict] = []

    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
        last = last_complete_superstep(checkpoint_dir)
        if last is not None:
            state = spark.read.parquet(_ckpt_path(checkpoint_dir, last))
            with open(_metrics_path(checkpoint_dir, last)) as fh:
                metrics_log = json.load(fh).get("history", [])
            start_k = last
            resumed_from = last
            if metrics_log and converged and converged(metrics_log[-1]):
                return IterationResult(state, last, metrics_log, resumed_from)

    state = state.persist()
    state.count()  # materialize

    # JVM handle of the CURRENT state's localCheckpoint blocks (None
    # when state is a plain persist or durable parquet); freed as soon
    # as the next state is materialized
    state_ckpt_jrdd = None
    k = start_k
    while k < max_iterations:
        t0 = time.time()
        new_state, m = step(state, k)
        k += 1

        durable = checkpoint_dir and (k % checkpoint_every == 0 or k == max_iterations)
        if durable:
            path = _ckpt_path(checkpoint_dir, k)
            writer = new_state.write.mode("overwrite")
            if state_partitions:
                writer = new_state.repartition(state_partitions).write.mode("overwrite")
            writer.parquet(path)  # the materializing action
            state.unpersist()
            if state_ckpt_jrdd is not None:
                state_ckpt_jrdd.unpersist(False)
            state_ckpt_jrdd = None
            # re-read: truncates lineage AND pins state to durable storage
            new_state = spark.read.parquet(path).persist()
            n_rows = new_state.count()
            # per-partition lineage: one manifest entry per state
            # partition file (name + bytes) so a resumed run — or an
            # auditor — can tie every partition of superstep K to the
            # exact files superstep K+1 read
            part_files = sorted(
                f for f in os.listdir(path)
                if f.startswith("part-") and not f.endswith(".crc")
            )
            partition_lineage = [
                {"file": f, "bytes": os.path.getsize(os.path.join(path, f))}
                for f in part_files
            ]
        else:
            # truncate lineage in-memory between durable checkpoints;
            # eager localCheckpoint is the single materializing action
            # (no extra count job — row count is a durable-ckpt metric)
            new_state = new_state.localCheckpoint(eager=True)
            state.unpersist()
            # the new checkpoint is materialized, so the previous one's
            # RDD-level blocks (which DataFrame.unpersist cannot reach)
            # are dead weight — free them NOW instead of waiting for
            # the ContextCleaner (see _local_ckpt_jrdd)
            if state_ckpt_jrdd is not None:
                state_ckpt_jrdd.unpersist(False)
            state_ckpt_jrdd = _local_ckpt_jrdd(new_state)
            n_rows = None
            partition_lineage = None

        wall = time.time() - t0
        m = dict(m)
        m.update(
            {
                "superstep": k,
                "rows": n_rows,
                "wall_sec": round(wall, 4),
            }
        )
        if partition_lineage is not None:
            m["num_partitions"] = len(partition_lineage)
            m["partition_lineage"] = partition_lineage
        metrics_log.append(m)
        if durable:
            with open(_metrics_path(checkpoint_dir, k), "w") as fh:
                json.dump({"superstep": k, "history": metrics_log}, fh)

        state = new_state
        if converged and converged(m):
            break

    return IterationResult(state, k, metrics_log, resumed_from)
