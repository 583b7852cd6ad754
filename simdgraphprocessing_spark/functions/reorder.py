"""Vertex reorderings — the reference's physical-tuning knobs
(``MutableGraph.hpp:268-285`` degree orders, ``:179-198`` strong run,
``:203-207`` random). Each returns a mapping ``(id, new_id)`` to feed
:func:`simdgraphprocessing_spark.graph.reassign_ids`.

BFS order (``:126-172``) and shingle order (``:214-265``) are
intentionally not ported: the reference seeds them from
``rand()``/shuffled queues, so their output is not reproducible even
against itself — our degree orders are the deterministic ones its
tests actually rely on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simdgraphprocessing_spark.functions.ranking import global_row_number
from simdgraphprocessing_spark.graph import degrees


def _rank(deg: DataFrame, order) -> DataFrame:
    return global_row_number(deg, order, out_col="new_id")


def reorder_by_degree(edges: DataFrame) -> DataFrame:
    """Descending degree, ties by old id (``:268-272``)."""
    return _rank(degrees(edges), [F.col("degree").desc(), F.col("id").asc()])


def reorder_by_rev_degree(edges: DataFrame) -> DataFrame:
    """Ascending degree (``:275-279``)."""
    return _rank(degrees(edges), [F.col("degree").asc(), F.col("id").asc()])


def reorder_strong_run(edges: DataFrame) -> DataFrame:
    """Largest neighborhood first, then its neighbors consecutively
    (``:179-198``): order vertices by (owner-hub degree desc, hub id,
    position in hub's sorted list). Approximated deterministically:
    each vertex is owned by its max-degree neighbor; hubs order their
    blocks by degree."""
    deg = degrees(edges)
    owner = (
        edges.join(deg.select(F.col("id").alias("dst"), F.col("degree").alias("nd")), "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(F.max_by("dst", F.struct(F.col("nd"), (-F.col("dst")).alias("t"))).alias("owner"))
    )
    ranked = (
        deg.join(owner, "id", "left")
        .withColumn("owner", F.coalesce(F.col("owner"), F.col("id")))
        .join(
            deg.select(F.col("id").alias("owner"), F.col("degree").alias("owner_deg")),
            "owner",
        )
    )
    return global_row_number(
        ranked,
        [F.col("owner_deg").desc(), F.col("owner").asc(), F.col("id").asc()],
        out_col="new_id",
    ).select("id", "new_id", "degree")


def reorder_random(edges: DataFrame, seed: int = 42) -> DataFrame:
    """Deterministic pseudo-random permutation (hash order) — the
    reproducible stand-in for ``reorder_random`` (``:203-207``)."""
    deg = degrees(edges)
    return _rank(deg, [F.xxhash64(F.col("id"), F.lit(seed)).asc(), F.col("id").asc()])
