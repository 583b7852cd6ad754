"""Graph data model: normalized edge tables, degree ordering, adjacency.

Reproduces the reference loader semantics
(``MutableGraph.hpp:517-599`` undirectedFromEdgeList: symmetrize +
dedup + sort; ``:268-285`` reorder_by_degree) as declarative Spark
plans. The physical invariants the reference maintains in RAM
(sorted neighbor lists, degree-descending dense ids, orientation
filters) become column invariants of DataFrames here, so Catalyst can
push filters into the parquet scan and prune columns for free.

Scale notes (100 TB design):
* Vertex-id assignment uses a degree-descending ``row_number`` over the
  (comparatively tiny) vertex set — one shuffle over V, not E.
* The canonical edge table is hash-partitioned by ``src`` once and
  persisted; every downstream join on ``src`` reuses that exchange.
* Skew: degree ordering puts hubs at low ids; AQE skew-join splitting
  plus the optional salted hub replication in :func:`salt_hubs`
  handles power-law fan-out (the reference's dynamic work queue,
  ``common.hpp:214-276``, solved the same problem on one node).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_edges(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    symmetrize: bool = True,
    drop_self_loops: bool = True,
) -> DataFrame:
    """Canonical edge table: ``(src, dst)`` bigint, deduped, no loops.

    ``symmetrize=True`` mirrors ``undirectedFromEdgeList``
    (``MutableGraph.hpp:577-578`` inserts both directions, ``:588-593``
    sorts + uniques each row): we union the swapped pairs and
    ``dropDuplicates``. The dedup is one hash shuffle on (src,dst);
    sortedness of neighbor lists is re-established wherever a list is
    materialized (``sort_array``), not carried as a global sort.
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    if drop_self_loops:
        e = e.filter(F.col("src") != F.col("dst"))
    if symmetrize:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return e.dropDuplicates(["src", "dst"])


def degrees(edges: DataFrame) -> DataFrame:
    """Out-degree per vertex: ``(id, degree)``.

    On a symmetrized table this is THE degree (reference rows==columns,
    ``SparseMatrix.hpp:400-403``). Map-side partial aggregation makes
    this one light shuffle.
    """
    return edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("degree"))


def degree_rank_ids(edges: DataFrame) -> DataFrame:
    """Dense ids by descending degree, ties by old id — the reference's
    ``reorder_by_degree`` (``MutableGraph.hpp:268-272``,
    ``OrderNeighborhoodByDegree`` ``:20-32``). Returns
    ``(id, new_id, degree)`` with ``new_id`` in ``[0, V)``.

    Ranking is the scalable two-pass range-partition scheme
    (:func:`~simdgraphprocessing_spark.functions.ranking.global_row_number`)
    — never a single-partition window — so it holds at 10^10 vertices.
    It touches only V rows, never E.
    """
    from simdgraphprocessing_spark.functions.ranking import global_row_number

    deg = degrees(edges)
    return global_row_number(
        deg, [F.col("degree").desc(), F.col("id").asc()], out_col="new_id"
    )


def reassign_ids(edges: DataFrame, mapping: DataFrame) -> DataFrame:
    """Remap src/dst through ``mapping(id, new_id)`` — the reference's
    ``reassign_ids`` (``MutableGraph.hpp:100-123``), done as two joins.
    The mapping is vertex-sized, so both joins broadcast when V is
    small; at scale they are co-partitioned hash joins on the id.
    """
    m = F.broadcast(mapping.select("id", "new_id"))
    return (
        edges.join(m.withColumnRenamed("id", "src").withColumnRenamed("new_id", "_s"), "src")
        .join(m.withColumnRenamed("id", "dst").withColumnRenamed("new_id", "_d"), "dst")
        .select(F.col("_s").alias("src"), F.col("_d").alias("dst"))
    )


def induced_subgraph(edges: DataFrame, vertices: DataFrame, id_col: str = "id") -> DataFrame:
    """Edges whose BOTH endpoints pass a node selection — the
    reference's ``node_selection`` predicate applied while packing
    (``SparseMatrix.hpp:240``; attributes loaded
    ``MutableGraph.hpp:403-404``). ``vertices`` is the selected vertex
    set (one ``id`` column, e.g. an attribute table filtered on the
    predicate).

    Plan: two left_semi joins. The vertex list is V-sized (small next
    to E); Spark broadcasts it when under the threshold, else hash
    joins co-partitioned on the endpoint — either way E is scanned
    once and never duplicated.
    """
    v = vertices.select(F.col(id_col).cast("long").alias("id"))
    return (
        edges.join(v.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(v.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .select("src", "dst")
    )


def orient_by_degree(edges: DataFrame) -> DataFrame:
    """Keep each undirected edge once, pointing low-rank → high-rank id.

    After :func:`degree_rank_ids` relabeling, ``src < dst`` means
    "src has the higher (or tied-earlier) degree", so every oriented
    adjacency list is bounded by O(sqrt(E)) on power-law graphs — the
    same symmetry-breaking the reference applies with its
    ``nbr < node`` edge_selection
    (``apps/undirected_triangle_counting.cpp:20-23``).
    """
    return edges.filter(F.col("src") < F.col("dst"))


def adjacency(
    edges: DataFrame, src: str = "src", dst: str = "dst", attr: str | None = None
) -> DataFrame:
    """Adjacency-clustered form: ``(id, nbrs array<long> sorted, degree)``.

    The Spark analog of the reference's CSR rows
    (``SparseMatrix.hpp:22-30``): all neighbors of a vertex contiguous
    and sorted. One shuffle (groupBy src); ``sort_array`` restores the
    reference's per-row sorted invariant (``MutableGraph.hpp:588``).

    ``attr``: name of a per-edge attribute column to carry through —
    the reference's ``*FromAttributeList`` loaders keep edge attrs
    aligned with the neighbor list while sorting
    (``MutableGraph.hpp:493-513``); here the struct sort does the same
    alignment, and the output gains an ``attrs`` array parallel to
    ``nbrs`` so predicates can run per-row inside the adjacency (see
    :func:`filter_adjacency_attrs`) without re-grouping E.
    """
    if attr is None:
        return edges.groupBy(F.col(src).alias("id")).agg(
            F.sort_array(F.collect_list(F.col(dst))).alias("nbrs"),
            F.count("*").alias("degree"),
        )
    return (
        edges.groupBy(F.col(src).alias("id"))
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(dst).alias("nbr"), F.col(attr).alias("attr")))
            ).alias("_z")
        )
        .select(
            "id",
            F.col("_z.nbr").alias("nbrs"),
            F.col("_z.attr").alias("attrs"),
            F.size("_z").alias("degree"),
        )
    )


def filter_adjacency_attrs(adj: DataFrame, predicate) -> DataFrame:
    """Apply an edge-attribute predicate INSIDE the adjacency — the
    reference's edge_selection over an attribute list
    (``apps/undirected_fish_counting.cpp:33-36`` filters
    ``attr == 2012`` while producing the query subgraph from the
    already-built attributed graph, not by re-reading the edge list).

    ``adj`` is the output of :func:`adjacency` with ``attr=...``;
    ``predicate`` is a python function Column → Column over one attr
    value. Runs as a per-row higher-order ``filter`` over the zipped
    (nbr, attr) arrays — a narrow JVM map, NO shuffle: the E-sized
    grouping already paid for is reused, which is the whole point of
    storing attrs in the adjacency. Returns ``(id, nbrs, degree)``
    (sorted invariant preserved — filtering keeps order).
    """
    kept = F.filter(
        F.arrays_zip("nbrs", "attrs"), lambda s: predicate(s["attrs"])
    )
    return (
        adj.withColumn("_k", kept)
        .select("id", F.col("_k.nbrs").alias("nbrs"), F.size("_k").alias("degree"))
        .filter(F.col("degree") > 0)
    )


def salt_hubs(edges: DataFrame, hub_degree: int = 1 << 16, salts: int = 16) -> DataFrame:
    """Explicit skew handling: split hub vertices' edge lists across
    ``salts`` synthetic sub-keys so no single task owns a whole hub.

    Adds a ``salt`` column; aggregations over hub neighborhoods run
    per-(vertex, salt) partially, then re-aggregate per vertex — the
    distributed version of the reference's chunked dynamic work queue
    (``common.hpp:241`` atomic fetch_add over 100–256-row chunks).
    Non-hub vertices get salt 0, so the second aggregation is nearly
    free for them.
    """
    deg = degrees(edges)
    hubs = deg.filter(F.col("degree") >= hub_degree).select(
        F.col("id").alias("src"), F.lit(True).alias("_is_hub")
    )
    out = edges.join(F.broadcast(hubs), "src", "left")
    return out.withColumn(
        "salt",
        F.when(
            F.col("_is_hub").isNotNull(), F.pmod(F.col("dst"), F.lit(salts)).cast("int")
        ).otherwise(F.lit(0)),
    ).drop("_is_hub")


@dataclass
class Graph:
    """An undirected (or directed) graph over a canonical edge table.

    ``edges`` is normalized (deduped, loop-free; both directions stored
    when undirected, mirroring ``SparseMatrix.hpp:400-403``).
    """

    edges: DataFrame
    directed: bool = False
    _cache: dict = field(default_factory=dict, repr=False)

    @classmethod
    def from_edge_list(
        cls, edges: DataFrame, src: str = "src", dst: str = "dst", directed: bool = False
    ) -> "Graph":
        e = normalize_edges(edges, src=src, dst=dst, symmetrize=not directed)
        return cls(edges=e, directed=directed)

    @classmethod
    def from_edge_list_degree_ordered(
        cls, edges: DataFrame, src: str = "src", dst: str = "dst", directed: bool = False
    ) -> "Graph":
        """Normalize then relabel to degree-descending dense ids
        (reference load pipeline: fromEdgeList + reorder_by_degree)."""
        g = cls.from_edge_list(edges, src=src, dst=dst, directed=directed)
        mapping = degree_rank_ids(g.edges)
        return cls(edges=reassign_ids(g.edges, mapping), directed=directed)

    def degrees(self) -> DataFrame:
        return degrees(self.edges)

    def out_edges(self) -> DataFrame:
        return self.edges

    def in_edges(self) -> DataFrame:
        """Directed graphs carry separate in/out views
        (``SparseMatrix.hpp:639-643``) — here a rename, no copy."""
        return self.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))

    def adjacency(self) -> DataFrame:
        return adjacency(self.edges)

    def num_vertices(self) -> int:
        return (
            self.edges.select(F.col("src").alias("id"))
            .union(self.edges.select(F.col("dst").alias("id")))
            .distinct()
            .count()
        )

    def num_edges(self) -> int:
        n = self.edges.count()
        return n if self.directed else n // 2

    def persist(self, partitions: int | None = None) -> "Graph":
        """Hash-partition by src once and persist — downstream joins on
        src reuse this exchange instead of re-shuffling E."""
        e = self.edges.repartition(partitions, "src") if partitions else self.edges.repartition("src")
        return Graph(edges=e.persist(), directed=self.directed)
