"""Motif counts beyond triangles — lollipop / tadpole / fish
(``apps/undirected_lollipop_counting.cpp``,
``undirected_tadpole_counting.cpp``, ``undirected_fish_counting.cpp``).

Lollipop semantics (from the reference core loop, lollipop ``:50-67``):
for each vertex x, each triangle {x,y,z} incident to x contributes
deg(x). Summed over all x: lollipops = Σ_triangles (deg(x)+deg(y)+deg(z)).
Relational plan: per-vertex triangle participation t(v) (from the
per-edge triangle join), then Σ t(v)·deg(v) — two shuffles total.

Scale note: tadpole/fish are ENUMERATIONS — the count equals the
instance count, and both the reference's nested SIMD loops and these
joins pay the instance stream. Verified exact on dense input
(tests/test_motifs_dense.py, K12 vs literal-loop goldens), but on
graphs where the instance count itself explodes (the sf0.01 co-order
graph reaches ~10^13 tadpoles) no enumerator finishes; the path there
is a factorized rewrite (push the tail-path factor Σ_a (deg(a)−1)
into the 4-vertex core as a closed form instead of joining it out —
lollipop_count above is exactly such a factorization and stays
output-size-free).
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


def tadpole_count(edges: DataFrame) -> DataFrame:
    """Tadpole motif count (``apps/undirected_tadpole_counting.cpp:67-100``).

    Exact loop semantics (x..b over the full symmetric adjacency):
    y∈N(x); z∈N(y), z≠x; w∈N(x)∩N(z), w<y; a∈N(x)∖{y,w,z};
    b∈N(a), b≠x — each assignment counts 1. Expressed as a 6-way
    conjunctive self-join; Catalyst orders the joins, AQE splits skew.
    Single row ``(tadpoles bigint)``.
    """
    e = edges

    def sel(x, y):
        return e.select(F.col("src").alias(x), F.col("dst").alias(y))

    q = (
        sel("x", "y")
        .join(sel("y", "z"), "y")
        .filter(F.col("z") != F.col("x"))
        .join(sel("x", "w"), "x")
        .join(sel("z", "w"), ["z", "w"], "left_semi")
        .filter(F.col("w") < F.col("y"))
        .join(sel("x", "a"), "x")
        .filter((F.col("a") != F.col("y")) & (F.col("a") != F.col("w")) & (F.col("a") != F.col("z")))
        .join(sel("a", "b"), "a")
        .filter(F.col("b") != F.col("x"))
    )
    return q.agg(F.count("*").alias("tadpoles"))


def fish_count(edges: DataFrame) -> DataFrame:
    """Fish motif count (``apps/undirected_fish_counting.cpp:80-117``).

    Loop semantics: y∈N(x); z∈N(x)∩N(y), z<y (oriented triangle
    x,y,z); w∈N(x)∖{y,z}; a∈N(w)∖{x,y,z}; b∈N(x)∩N(a) with b<w,
    b∉{z,y}. Single row ``(fishes bigint)``.
    """
    e = edges

    def sel(x, y):
        return e.select(F.col("src").alias(x), F.col("dst").alias(y))

    q = (
        sel("x", "y")
        .join(sel("x", "z"), "x")
        .join(sel("y", "z"), ["y", "z"], "left_semi")
        .filter(F.col("z") < F.col("y"))
        .join(sel("x", "w"), "x")
        .filter((F.col("w") != F.col("y")) & (F.col("w") != F.col("z")))
        .join(sel("w", "a"), "w")
        .filter((F.col("a") != F.col("x")) & (F.col("a") != F.col("y")) & (F.col("a") != F.col("z")))
        .join(sel("x", "b"), "x")
        .join(sel("a", "b"), ["a", "b"], "left_semi")
        .filter((F.col("b") < F.col("w")) & (F.col("b") != F.col("z")) & (F.col("b") != F.col("y")))
    )
    return q.agg(F.count("*").alias("fishes"))


def lollipop_count(edges: DataFrame) -> DataFrame:
    """Single row ``(lollipops bigint)`` = Σ_v tri(v)·deg(v)
    (reference golden: 713,455,740 on ego-Facebook)."""
    tpv = triangles_per_vertex(edges)
    deg = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    return (
        tpv.join(deg, "id")
        .agg(F.coalesce(F.sum(F.col("tri") * F.col("deg")), F.lit(0)).alias("lollipops"))
    )
