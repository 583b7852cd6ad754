"""k-clique counting (``apps/n_clique.cpp:30-50``): recursive
intersection over orientation-filtered lists, counted once per clique.

Relational form: grow a clique-prefix DataFrame one vertex at a time
along oriented edges (v1 < v2 < ... < vk in degree-rank order), with a
left_semi edge check against every earlier prefix vertex — the same
candidate-set shrinking as C_d = C_{d-1} ∩ N(v_d), expressed as joins
Catalyst can reorder/broadcast; AQE splits skewed hubs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cliques(edges: DataFrame, k: int = 4) -> DataFrame:
    """DataFrame of k-cliques (v1 .. vk), each exactly once (v1<...<vk)."""
    if k < 2:
        raise ValueError("k >= 2")
    e = edges.filter(F.col("src") < F.col("dst"))
    cur = e.select(F.col("src").alias("v1"), F.col("dst").alias("v2"))
    for depth in range(3, k + 1):
        prev_last = f"v{depth - 1}"
        new_v = f"v{depth}"
        grown = cur.join(
            e.select(F.col("src").alias(prev_last), F.col("dst").alias(new_v)),
            prev_last,
        )
        # closure check: every earlier prefix vertex must link to new_v
        for i in range(1, depth - 1):
            grown = grown.join(
                e.select(F.col("src").alias(f"v{i}"), F.col("dst").alias(new_v)),
                [f"v{i}", new_v],
                "left_semi",
            )
        cur = grown.select(*[f"v{i}" for i in range(1, depth + 1)])
    return cur


def clique_count(edges: DataFrame, k: int = 4) -> DataFrame:
    """Single row ``(cliques bigint)`` (reference golden: 30,004,668
    4-cliques on ego-Facebook)."""
    return cliques(edges, k).agg(F.count("*").alias("cliques"))
