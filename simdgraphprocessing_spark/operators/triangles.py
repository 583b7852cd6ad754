"""Triangle counting — the reference's flagship query
(``apps/undirected_triangle_counting.cpp``).

Semantics: over a symmetrized, deduped, loop-free edge table, count
each triangle exactly once by orienting edges (reference
edge_selection ``nbr < node``, ``:20-23``) and summing
|N⁺(u) ∩ N⁺(v)| over oriented edges (u,v) (core loop ``:45-56``).

Three method values (default ``"auto"``):

* ``method="auto"``: CSR kernel when the oriented adjacency fits the
  broadcast cap, relational join plan otherwise — the same cutover
  :func:`~simdgraphprocessing_spark.operators.cliques.clique_count`
  makes, and the same decision Spark itself makes between
  broadcast-hash and shuffle joins. Round-4 driver bench under the
  cap: csr 9.4 s vs join 18.0 s — a join default was the slower plan
  exactly where most graphs live. Honesty note from round-5 repeat
  measurements: with warm min-of-2 sampling the two plans land within
  ~1.5× of each other in either direction (join 5.8 s vs csr 6.6 s in
  one quiet window, join 5.4 s vs csr 11.2 s in another), so the cap
  is a structural-safety cutover (never broadcast what doesn't fit),
  not a guaranteed-fastest pick; callers who care at the margin
  should measure both on their graph, as `bench.py` does.

* ``method="join"``: a declarative 3-way self-join that
  Catalyst plans as two shuffle joins with AQE; this is the
  worst-case-optimal triangle join expressed relationally. No Python
  runs at all — whole-stage codegen end to end. The unbounded-scale
  path (nothing is broadcast).

* ``method="csr"``: the reference-shaped plan. Two physical
  realizations, picked by adjacency size:

  - **broadcast CSR** (oriented adjacency ≤ ``CSR_BROADCAST_VALUES``
    values): the whole oriented CSR (ids/offsets/values numpy arrays)
    broadcasts once, and ``mapInArrow`` streams the oriented EDGE
    table through the batched intersect kernel — zero per-edge list
    shipping, no join at all. This is literally the reference's
    execution model (shared in-memory CSR + streamed edge loop,
    ``undirected_triangle_counting.cpp:45-56``) realized with
    Spark broadcast instead of shared memory. A 10⁹-oriented-edge
    graph's CSR is ~8 GB — beyond broadcast — hence the cap.
  - **join-shipped CSR** (above the cap): ship each oriented edge
    with both endpoint lists into the Arrow batch via two joins.
    Moves Σ deg·|N⁺| values through the exchange — correct at any
    scale but join method usually beats it there.

Scale: orientation by degree-rank bounds every oriented list by
O(sqrt(E)) on power-law graphs, so the skew that would otherwise
melt the ``src`` shuffle is structurally removed — same reason the
reference orients before intersecting.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _check_method(method: str) -> None:
    if method not in ("auto", "csr", "join"):
        raise ValueError("method must be auto, csr or join")


def _per_edge_csr_if_fits(edges: DataFrame, cap: int | None = None) -> DataFrame | None:
    """``auto`` cutover probe: the broadcast-CSR per-edge plan when the
    oriented adjacency fits ``cap`` (default ``CSR_BROADCAST_VALUES``),
    else None (caller falls back to the relational join — the
    unbounded-scale plan). The probe's cost is one count on the
    persisted sorted oriented edges, which the CSR build needs anyway
    when it fits."""
    e = _oriented(edges)
    bc = broadcast_oriented_csr(e, cap=cap if cap is not None else CSR_BROADCAST_VALUES)
    if bc is None:
        return None
    return _per_edge_csr_broadcast(e, bc)


def _oriented(edges: DataFrame) -> DataFrame:
    """One row per undirected edge, src < dst (degree-ordered ids →
    this is the reference's nbr<node orientation after reorder_by_degree)."""
    return edges.filter(F.col("src") < F.col("dst"))


def triangles_per_edge(
    edges: DataFrame, method: str = "auto", csr_cap: int | None = None
) -> DataFrame:
    """(src, dst, tri_cnt): number of triangles closing each oriented edge.

    Only edges closing ≥1 triangle appear (the relational plan's
    natural output; the csr realizations filter their zero rows to
    match, so the method choice never changes the result set).
    ``csr_cap`` overrides the auto-cutover broadcast cap (tests)."""
    _check_method(method)
    per_edge = None
    if method == "csr":
        per_edge = _per_edge_csr(edges)
    elif method == "auto":
        per_edge = _per_edge_csr_if_fits(edges, cap=csr_cap)
    if per_edge is not None:
        return per_edge.filter(F.col("tri_cnt") > 0)
    e = _oriented(edges)
    e1 = e.alias("e1")  # (a, b)
    e2 = e.alias("e2")  # (b, c)
    e3 = e.alias("e3")  # (a, c)
    tri = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src")) & (F.col("e3.dst") == F.col("e2.dst")),
            "left_semi",
        )
        .groupBy(F.col("e1.src").alias("src"), F.col("e1.dst").alias("dst"))
        .agg(F.count("*").alias("tri_cnt"))
    )
    return tri


def triangle_count(
    edges: DataFrame, method: str = "auto", csr_cap: int | None = None
) -> DataFrame:
    """Single-row DataFrame ``(triangles bigint)`` — global count.

    ``method="auto"`` (default): broadcast-CSR kernel when the oriented
    adjacency fits ``CSR_BROADCAST_VALUES`` (override with ``csr_cap``),
    relational join plan otherwise (see module docstring)."""
    _check_method(method)
    per_edge = None
    if method == "csr":
        per_edge = _per_edge_csr(edges)
    elif method == "auto":
        per_edge = _per_edge_csr_if_fits(edges, cap=csr_cap)
    if per_edge is not None:
        return per_edge.agg(F.coalesce(F.sum("tri_cnt"), F.lit(0)).alias("triangles"))
    e = _oriented(edges)
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src")) & (F.col("e3.dst") == F.col("e2.dst")),
            "left_semi",
        )
        .agg(F.count("*").alias("triangles"))
    )
    return tri


def triangles_from_adjacency(adj: DataFrame) -> DataFrame:
    """Global triangle count straight from an adjacency table
    ``(id, nbrs array<long> sorted, ...)`` over the SYMMETRIZED graph —
    the consumer of :func:`~simdgraphprocessing_spark.graph.adjacency`
    with ``attr=...`` + ``filter_adjacency_attrs``: the reference runs
    edge_selection attribute predicates against the already-built
    attributed graph (``apps/undirected_fish_counting.cpp:33-36``) and
    then intersects, never re-reading the edge list; this is the same
    contract (filter the adjacency per row — narrow — then count here
    without re-grouping E).

    Plan: orient per row with a higher-order ``filter(nbrs, n > id)``
    (narrow, order-preserving), explode to oriented edges carrying the
    src list along, ONE hash join on dst for the dst list, Arrow
    intersect kernel, global sum. Returns ``(triangles bigint)``.

    Scale note: like the join-shipped CSR path, this ships each
    oriented list once per incident oriented edge, so degree-rank the
    ids first (``Graph.from_edge_list_degree_ordered``) to bound the
    oriented lists by O(sqrt(E)) on power-law graphs.
    """
    from simdgraphprocessing_spark import kernels

    o = adj.select(
        "id", F.filter("nbrs", lambda n: n > F.col("id")).alias("nbrs")
    ).filter(F.size("nbrs") > 0)
    pairs = (
        o.select(
            F.col("id").alias("src"),
            F.explode("nbrs").alias("dst"),
            F.col("nbrs").alias("nbrs_src"),
        )
        .join(
            o.select(F.col("id").alias("dst"), F.col("nbrs").alias("nbrs_dst")), "dst"
        )
        .select("src", "dst", "nbrs_src", "nbrs_dst")
    )

    out_schema = "tri_cnt long"

    def count_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            a = batch.column("nbrs_src")
            b = batch.column("nbrs_dst")
            counts = kernels.intersect_count_many(
                a.offsets.to_numpy(),
                a.values.to_numpy(zero_copy_only=False),
                b.offsets.to_numpy(),
                b.values.to_numpy(zero_copy_only=False),
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array([int(counts.sum())], pa.int64())], names=["tri_cnt"]
            )

    per_batch = pairs.mapInArrow(count_batches, out_schema)
    return per_batch.agg(F.coalesce(F.sum("tri_cnt"), F.lit(0)).alias("triangles"))


# oriented adjacencies up to this many values broadcast as a shared
# CSR (8 B/value → 400 MB at the cap); larger graphs join-ship lists.
# session.py sets spark.driver.maxResultSize=4g to clear the capped
# Arrow collect with headroom.
CSR_BROADCAST_VALUES = 50_000_000

# the most recent shared-CSR broadcast: a NEW build unpersists the
# previous one (drops executor copies; a still-lazy old plan would
# transparently re-fetch from the driver), so repeated csr calls in
# one session hold at most one executor-side CSR copy. Call
# release_csr_broadcast() to drop the last one too.
_LAST_CSR_BC = None


def release_csr_broadcast() -> None:
    global _LAST_CSR_BC
    if _LAST_CSR_BC is not None:
        _LAST_CSR_BC.unpersist()
        _LAST_CSR_BC = None


def _collect_sorted_edges(e: DataFrame, cap: int):
    """Distributed CSR prep: range-partition + sort (src, dst) on the
    EXECUTORS, then collect the already-sorted flat columns via Arrow
    in partition order. The driver never sorts E — it concatenates
    pre-sorted int64 blocks (a memcpy) and runs ``np.unique`` on a
    sorted array (one linear scan). Returns ``(src, dst)`` numpy
    arrays, or None when the oriented edge count exceeds ``cap``
    (checked on the persisted sorted form — a cache-resident count,
    not a second lineage pass).
    """
    import numpy as np

    p = max(e.sparkSession.sparkContext.defaultParallelism, 8)
    se = (
        e.select("src", "dst")
        .repartitionByRange(p, "src", "dst")
        .sortWithinPartitions("src", "dst")
        .persist()
    )
    try:
        if se.count() > cap:
            return None
        tbl = se.toArrow()  # partition order == global (src, dst) order
        s = tbl.column("src").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        d = tbl.column("dst").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        return s, d
    finally:
        se.unpersist()


def broadcast_oriented_csr(e: DataFrame, cap: int = CSR_BROADCAST_VALUES):
    """Build + broadcast the oriented CSR from flat pre-sorted edge
    columns (never from per-row list objects). Returns the broadcast —
    value ``(ids, offsets, values, universe)`` with ``universe`` = the
    id-space size for density decisions — or None when the oriented
    edge count exceeds ``cap``. Shared by the triangle and clique CSR
    paths; a new build unpersists the previous broadcast."""
    import numpy as np

    global _LAST_CSR_BC
    sorted_cols = _collect_sorted_edges(e, cap)
    if sorted_cols is None:
        return None
    s, values = sorted_cols
    # s is sorted — unique boundaries come from one linear scan
    ids, starts = np.unique(s, return_index=True)
    offsets = np.concatenate((starts, [len(s)])).astype(np.int64)
    universe = int(
        max(ids[-1] if len(ids) else -1, values.max() if len(values) else -1)
    ) + 1
    release_csr_broadcast()
    bc = e.sparkSession.sparkContext.broadcast((ids, offsets, values, universe))
    _LAST_CSR_BC = bc
    return bc


def _per_edge_csr_broadcast(e: DataFrame, bc) -> DataFrame:
    """Shared-CSR realization: drive the per-edge loop FROM the
    broadcast CSR — each task streams its edge batches against the
    shared arrays. This is the reference's ``par_for`` over CSR rows
    (``undirected_triangle_counting.cpp:45-56``) with Spark broadcast
    standing in for shared memory; nothing E-sized shuffles.
    """
    import numpy as np

    out_schema = "src long, dst long, tri_cnt long"

    def count_batches(batches):
        from simdgraphprocessing_spark import kernels

        b_ids, b_off, b_val, _universe = bc.value
        nv = len(b_ids)

        def row_offsets(v: "np.ndarray"):
            i = np.searchsorted(b_ids, v)
            i_c = np.minimum(i, nv - 1) if nv else i
            ok = (i < nv) & (b_ids[i_c] == v) if nv else np.zeros(len(v), bool)
            return np.where(ok, b_off[i_c], 0), np.where(
                ok, b_off[np.minimum(i_c + 1, nv)], 0
            )

        for batch in batches:
            # materialize plain int64 — parquet scans may deliver
            # dictionary-encoded vectors, which must not leak into the
            # output batch (downstream codegen reads plain longs)
            sv = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
            dv = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
            sa, ea = row_offsets(sv)
            sb, eb = row_offsets(dv)
            counts = kernels.intersect_count_pairs(sa, ea, sb, eb, b_val)
            yield pa.RecordBatch.from_arrays(
                [pa.array(sv, pa.int64()), pa.array(dv, pa.int64()),
                 pa.array(counts, pa.int64())],
                names=["src", "dst", "tri_cnt"],
            )

    return e.mapInArrow(count_batches, out_schema)


def _per_edge_csr(edges: DataFrame) -> DataFrame:
    """Reference-shaped plan: oriented adjacency + Arrow intersect
    kernel; broadcast-CSR below ``CSR_BROADCAST_VALUES``, join-shipped
    lists above (see module docstring).
    """
    from simdgraphprocessing_spark import kernels
    from simdgraphprocessing_spark.graph import adjacency

    e = _oriented(edges)
    # one distributed sort pass doubles as the size probe (count on
    # the persisted sorted form) and the CSR source (Arrow collect of
    # pre-sorted blocks) — no separate strategy-probe scan, no
    # driver-side O(E) sort, no pandas materialization
    bc = broadcast_oriented_csr(e)
    if bc is not None:
        return _per_edge_csr_broadcast(e, bc)
    adj = adjacency(e).select("id", "nbrs")
    pairs = (
        e.join(adj.withColumnRenamed("id", "src").withColumnRenamed("nbrs", "nbrs_src"), "src")
        .join(adj.withColumnRenamed("id", "dst").withColumnRenamed("nbrs", "nbrs_dst"), "dst")
        .select("src", "dst", "nbrs_src", "nbrs_dst")
    )

    out_schema = "src long, dst long, tri_cnt long"

    def count_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            a = batch.column("nbrs_src")
            b = batch.column("nbrs_dst")
            counts = kernels.intersect_count_many(
                a.offsets.to_numpy(),
                a.values.to_numpy(zero_copy_only=False),
                b.offsets.to_numpy(),
                b.values.to_numpy(zero_copy_only=False),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("src"), batch.column("dst"), pa.array(counts, pa.int64())],
                names=["src", "dst", "tri_cnt"],
            )

    return pairs.mapInArrow(count_batches, out_schema)
