"""Deterministic graphs derived from the driver's TPC-H-ish testdata
(``/root/testdata/sf*/``) — the fixtures behind ``__spark_entry__``'s
DuckDB-oracle checks (FIXTURES.md §F4). Each function has an exactly
equivalent ANSI-SQL derivation in ``__spark_entry__.oracle_sql``; keep
them in lockstep.

All graphs return ORIENTED edge tables (src < dst, one row per
undirected edge) unless noted; symmetrize with
:func:`simdgraphprocessing_spark.graph.normalize_edges` for
algorithms that need both directions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def parts_cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts co-ordered in the same order: ~2k vertices / ~116k
    oriented edges at sf0.01 — the primary dense fixture.

    Plan: distinct (order, part) projection → self-join on order with
    ``a.p < b.p`` → distinct. The self-join key (order id) is
    high-cardinality and unskewed, so this shuffles cleanly; the
    distinct is the dedup the reference does at load.
    """
    li = _load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(b, "o")
        .filter(F.col("a.p") < F.col("b.p"))
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .distinct()
    )


def sparse_parts_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thin multi-component variant (quantity > 49 lineitems only) —
    the connected-components fixture (38 components at sf0.01)."""
    li = _load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 49).select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(b, "o")
        .filter(F.col("a.p") < F.col("b.p"))
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .distinct()
    )


def supplier_copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers sharing a high-quantity customer (quantity > 45):
    100 vertices / ~4.5k oriented edges — the small dense fixture
    (4-clique style stress on a near-complete graph)."""
    base = (
        _load(spark, sf_dir, "orders")
        .join(
            _load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, "c")
        .filter(F.col("a.s") < F.col("b.s"))
        .select(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
        .distinct()
    )


def follow_edges_attributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIRECTED attributed variant of :func:`follow_edges`: each edge
    carries ``et``, the lexicographically-smallest event_type that
    produced it — the fixture for ``directedFromAttributeList``
    (reference ``MutableGraph.hpp:724-892``: per-edge attrs aligned
    with the directed out-neighbor lists). Deterministic: min() makes
    the attribute independent of join order."""
    ev = (
        _load(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("h"),
        )
        .distinct()
    )
    a, b = ev.alias("a"), ev.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.h") == F.col("a.h") + F.expr("INTERVAL 1 HOUR"))
            & (F.col("a.user_id") != F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("src"),
            F.col("b.user_id").alias("dst"),
            F.col("a.event_type").alias("et"),
        )
        .distinct()
    )
    return pairs.groupBy("src", "dst").agg(F.min("et").alias("et"))


def follow_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIRECTED user graph from events: u → v if u was active in some
    (event_type, hour) and v in the same event_type the next hour.
    ~15.7k directed edges / 150 users at sf0.01 with heavy in/out
    overlap — the symbiosity (in/out Jaccard) fixture."""
    ev = (
        _load(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("h"),
        )
        .distinct()
    )
    a, b = ev.alias("a"), ev.alias("b")
    return (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.h") == F.col("a.h") + F.expr("INTERVAL 1 HOUR"))
            & (F.col("a.user_id") != F.col("b.user_id")),
        )
        .select(F.col("a.user_id").alias("src"), F.col("b.user_id").alias("dst"))
        .distinct()
    )
