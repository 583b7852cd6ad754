"""Motif counts beyond triangles — lollipop / tadpole / fish
(``apps/undirected_lollipop_counting.cpp``,
``undirected_tadpole_counting.cpp``, ``undirected_fish_counting.cpp``).

Lollipop semantics (from the reference core loop, lollipop ``:50-67``):
for each vertex x, each triangle {x,y,z} incident to x contributes
deg(x). Summed over all x: lollipops = Σ_triangles (deg(x)+deg(y)+deg(z)).
Relational plan: per-vertex triangle participation t(v) (from the
per-edge triangle join), then Σ t(v)·deg(v) — two shuffles total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """(id, tri) — number of triangles each vertex participates in."""
    e = edges.filter(F.col("src") < F.col("dst"))
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src")) & (F.col("e3.dst") == F.col("e2.dst")),
            "left_semi",
        )
        .select(
            F.col("e1.src").alias("a"), F.col("e1.dst").alias("b"), F.col("e2.dst").alias("c")
        )
    )
    verts = (
        tri.select(F.col("a").alias("id"))
        .union(tri.select(F.col("b").alias("id")))
        .union(tri.select(F.col("c").alias("id")))
    )
    return verts.groupBy("id").agg(F.count("*").alias("tri"))


def lollipop_count(edges: DataFrame) -> DataFrame:
    """Single row ``(lollipops bigint)`` = Σ_v tri(v)·deg(v)
    (reference golden: 713,455,740 on ego-Facebook)."""
    tpv = triangles_per_vertex(edges)
    deg = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    return (
        tpv.join(deg, "id")
        .agg(F.coalesce(F.sum(F.col("tri") * F.col("deg")), F.lit(0)).alias("lollipops"))
    )
