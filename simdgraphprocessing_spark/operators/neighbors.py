"""Neighborhood-similarity operators.

* :func:`common_neighbors` — |N(u) ∩ N(v)| for given vertex pairs
  (the reference's core ``set_intersect`` exposed relationally).
* :func:`similar_nodes` — vertices sharing > N common neighbors with
  the max-degree vertex (``apps/similar_nodes.cpp:49-58``; N=10,
  iterates ALL vertices including the max-degree vertex itself).
* :func:`symbiosity` — vertices whose in/out neighbor Jaccard exceeds
  a threshold (``apps/symbiosity.cpp:46-57``; ratio =
  |row∩col| / (|row|+|col|-|row∩col|), NaN for isolated vertices →
  not counted, matching C++ NaN>0.5 == false).
* :func:`jaccard_pairs` — per-edge Jaccard similarity of endpoint
  neighborhoods (building block for near-dup detection).

All are expressed as joins + aggregations so Catalyst plans them; the
common-neighbor join is an equi-join on the shared neighbor id —
exactly the reference's "intersection as join" reading (SURVEY §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simdgraphprocessing_spark.operators.stats import max_degree_vertex


def common_neighbors(edges: DataFrame, pairs: DataFrame | None = None) -> DataFrame:
    """(u, v, cn) — common-neighbor counts.

    Without ``pairs``: counts for every connected pair (u,v), u < v,
    at distance 2 or 1 (i.e., any pair sharing ≥1 neighbor). With
    ``pairs(u, v)``: restricted to those pairs via a semi-join first.

    Plan: wedge enumeration e1(u,w) ⋈ e2(v,w) on w — one shuffle on
    the neighbor id; skew on hub ws is split by AQE.
    """
    e1 = edges.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    e2 = edges.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    wedges = e1.join(e2, "w").filter(F.col("u") < F.col("v"))
    if pairs is not None:
        wedges = wedges.join(
            F.broadcast(pairs.select("u", "v")), ["u", "v"], "left_semi"
        )
    return wedges.groupBy("u", "v").agg(F.count("*").alias("cn"))


def similar_nodes(edges: DataFrame, threshold: int = 10) -> DataFrame:
    """Single row ``(similar bigint)``: #vertices with
    |N(v) ∩ N(m)| > threshold, m = max-degree vertex (ties → min id,
    matching the reference's first-arg-max scan,
    ``SparseMatrix.hpp:134-145``)."""
    m = max_degree_vertex(edges)  # 1-row DF (id, degree)
    nm = edges.join(
        F.broadcast(m.select(F.col("id").alias("src"))), "src", "left_semi"
    ).select(F.col("dst").alias("w"))
    cn = (
        edges.withColumnRenamed("dst", "w")
        .join(F.broadcast(nm), "w")
        .groupBy(F.col("src").alias("v"))
        .agg(F.count("*").alias("cn"))
    )
    return cn.filter(F.col("cn") > threshold).agg(F.count("*").alias("similar"))


def symbiosity(
    out_edges: DataFrame, in_edges: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Single row ``(symbiotic bigint)``: #vertices with
    Jaccard(out-nbrs, in-nbrs) > threshold.

    Relational form of ``apps/symbiosity.cpp:46-57``: intersection via
    inner join of the two edge views on (vertex, neighbor); union size
    by inclusion–exclusion from the two degrees.
    """
    out_deg = out_edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("outd")
    )
    in_deg = in_edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("ind"))
    inter = (
        out_edges.join(in_edges, ["src", "dst"], "inner")
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("both"))
    )
    j = (
        out_deg.join(in_deg, "id", "full")
        .join(inter, "id", "left")
        .na.fill({"outd": 0, "ind": 0, "both": 0})
        .withColumn(
            "union_sz", F.col("outd") + F.col("ind") - F.col("both")
        )
        .filter(F.col("union_sz") > 0)  # 0/0 → NaN in ref → never counted
        .withColumn("jac", F.col("both") / F.col("union_sz"))
    )
    return j.filter(F.col("jac") > threshold).agg(F.count("*").alias("symbiotic"))


def neighbors_exist(adj: DataFrame, predicate) -> DataFrame:
    """(id, found bool) — the reference's ``foreach_until`` early-exit
    neighbor scan (``src/set/Set.hpp:104``): does ANY neighbor satisfy
    the predicate? ``adj`` is an adjacency table (id, nbrs) from
    :func:`~simdgraphprocessing_spark.graph.adjacency`; ``predicate``
    is a Column lambda (e.g. ``lambda n: n > 100``). ``F.exists``
    short-circuits inside whole-stage codegen — the declarative form
    of the reference's early ``break``, with no driver involvement.
    """
    return adj.select("id", F.exists("nbrs", predicate).alias("found"))


def jaccard_pairs(edges: DataFrame, min_jaccard: float = 0.0) -> DataFrame:
    """(u, v, jac) for connected-or-wedge pairs u<v:
    |N(u)∩N(v)| / |N(u)∪N(v)|."""
    deg = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    cn = common_neighbors(edges)
    j = (
        cn.join(deg.select(F.col("id").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("deg").alias("dv")), "v")
        .withColumn("jac", F.col("cn") / (F.col("du") + F.col("dv") - F.col("cn")))
        .select("u", "v", "jac")
    )
    if min_jaccard > 0:
        j = j.filter(F.col("jac") >= min_jaccard)
    return j
