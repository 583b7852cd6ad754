"""Driver contract for the spark-graft builder (PySpark target).

Graph queries run over deterministic graphs derived from the driver's
TPC-H-ish testdata (FIXTURES.md §F4):

* ``eparts``   — parts co-ordered in the same order (dense, ~2k V /
  ~116k oriented E at sf0.01); primary pattern-query fixture.
* ``esparse``  — same construction restricted to quantity>49
  lineitems (41 V / 44 E, 38 components); CC fixture.
* ``efollow``  — DIRECTED user graph from events (same event_type,
  consecutive hours); symbiosity fixture.

Every Spark implementation lives in ``simdgraphprocessing_spark``;
every oracle below derives the identical graph in ANSI SQL. Column
names/aliases match exactly (the driver hash-compares after sorting
columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# --------------------------------------------------------------------- SQL
# Shared CTE prologues (DuckDB views: region nation customer supplier
# part orders lineitem events documents embeddings).

EPARTS = """
li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
eparts AS (SELECT DISTINCT a.p AS src, b.p AS dst
           FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
sym AS (SELECT src, dst FROM eparts UNION SELECT dst, src FROM eparts)
"""

ESPARSE = """
lis AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        FROM lineitem WHERE l_quantity > 49),
esparse AS (SELECT DISTINCT a.p AS src, b.p AS dst
            FROM lis a JOIN lis b ON a.o = b.o AND a.p < b.p),
ssym AS (SELECT src, dst FROM esparse UNION SELECT dst, src FROM esparse)
"""

EFOLLOW = """
ev AS (SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS h
       FROM events),
efollow AS (SELECT DISTINCT a.user_id AS src, b.user_id AS dst
            FROM ev a JOIN ev b
            ON a.event_type = b.event_type
            AND b.h = a.h + INTERVAL 1 HOUR
            AND a.user_id <> b.user_id)
"""


def _sym_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from simdgraphprocessing_spark.graph import normalize_edges
    from simdgraphprocessing_spark.sources import parts_cooccurrence_edges

    return normalize_edges(parts_cooccurrence_edges(spark, sf_dir))


def _sym_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from simdgraphprocessing_spark.graph import normalize_edges
    from simdgraphprocessing_spark.sources import sparse_parts_edges

    return normalize_edges(sparse_parts_edges(spark, sf_dir))


# ----------------------------------------------------------------- queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: triangle count over the sf0.001 parts graph
    (125,968 triangles) — ETL → normalize → orient → count."""
    from simdgraphprocessing_spark.operators import triangle_count

    return triangle_count(_sym_parts(spark, "/root/testdata/sf0.001"))


def _q_edges(spark, sf_dir):
    from simdgraphprocessing_spark.sources import parts_cooccurrence_edges

    return parts_cooccurrence_edges(spark, sf_dir)


def _q_degrees(spark, sf_dir):
    return (
        _sym_parts(spark, sf_dir)
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("degree"))
    )


def _q_degree_stats(spark, sf_dir):
    deg = _q_degrees(spark, sf_dir)
    return deg.agg(
        F.count("*").alias("num_vertices"),
        F.sum("degree").alias("num_directed_edges"),
        F.round(F.avg("degree"), 6).alias("avg_degree"),
        F.max("degree").alias("max_degree"),
        F.min("degree").alias("min_degree"),
    )


def _q_max_degree_vertex(spark, sf_dir):
    from simdgraphprocessing_spark.operators import max_degree_vertex

    return max_degree_vertex(_sym_parts(spark, sf_dir))


def _q_tri_join(spark, sf_dir):
    from simdgraphprocessing_spark.operators import triangle_count

    return triangle_count(_sym_parts(spark, sf_dir), method="join")


def _q_tri_csr(spark, sf_dir):
    from simdgraphprocessing_spark.operators import triangle_count

    return triangle_count(_sym_parts(spark, sf_dir), method="csr")


def _q_tri_per_edge_hist(spark, sf_dir):
    from simdgraphprocessing_spark.operators import triangles_per_edge

    per_edge = triangles_per_edge(_sym_parts(spark, sf_dir))
    return per_edge.groupBy(F.col("tri_cnt")).agg(F.count("*").alias("num_edges"))


def _q_clique4(spark, sf_dir):
    from simdgraphprocessing_spark.operators import clique_count

    return clique_count(_sym_parts(spark, sf_dir), k=4)


def _q_similar_nodes(spark, sf_dir):
    from simdgraphprocessing_spark.operators import similar_nodes

    return similar_nodes(_sym_parts(spark, sf_dir), threshold=10)


def _q_symbiosity(spark, sf_dir):
    from simdgraphprocessing_spark.graph import Graph
    from simdgraphprocessing_spark.operators import symbiosity
    from simdgraphprocessing_spark.sources import follow_edges

    g = Graph(edges=follow_edges(spark, sf_dir), directed=True)
    return symbiosity(g.out_edges(), g.in_edges(), threshold=0.5)


def _q_cn_histogram(spark, sf_dir):
    from simdgraphprocessing_spark.operators import common_neighbors

    cn = common_neighbors(_sym_parts(spark, sf_dir))
    return cn.groupBy("cn").agg(F.count("*").alias("num_pairs"))


def _q_jaccard_count(spark, sf_dir):
    from simdgraphprocessing_spark.operators.neighbors import jaccard_pairs

    j = jaccard_pairs(_sym_parts(spark, sf_dir))
    return j.filter(F.col("jac") > 0.5).agg(F.count("*").alias("num_similar_pairs"))


def _q_bfs_levels(spark, sf_dir):
    from simdgraphprocessing_spark.operators import bfs_levels

    lv = bfs_levels(_sym_parts(spark, sf_dir), max_depth=6)
    return lv.groupBy("level").agg(F.count("*").alias("cnt"))


def _q_components(spark, sf_dir):
    from simdgraphprocessing_spark.algorithms import connected_components

    return connected_components(_sym_sparse(spark, sf_dir)).state


def _q_component_sizes(spark, sf_dir):
    from simdgraphprocessing_spark.algorithms import connected_components

    st = connected_components(_sym_sparse(spark, sf_dir)).state
    return st.groupBy("component").agg(F.count("*").alias("size"))


def _q_pagerank(spark, sf_dir):
    from simdgraphprocessing_spark.algorithms import pagerank

    res = pagerank(_sym_parts(spark, sf_dir), max_iterations=10, tol=0.0)
    return res.state.select("id", F.round(F.col("rank"), 6).alias("rank6"))


def _q_label_propagation(spark, sf_dir):
    from simdgraphprocessing_spark.algorithms import label_propagation

    res = label_propagation(_sym_parts(spark, sf_dir), max_iterations=4)
    return res.state


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "graph_edges": _q_edges,
        "graph_degrees": _q_degrees,
        "graph_degree_stats": _q_degree_stats,
        "graph_max_degree_vertex": _q_max_degree_vertex,
        "triangle_count_join": _q_tri_join,
        "triangle_count_csr": _q_tri_csr,
        "triangles_per_edge_hist": _q_tri_per_edge_hist,
        "clique4_count": _q_clique4,
        "similar_nodes": _q_similar_nodes,
        "symbiosity_directed": _q_symbiosity,
        "common_neighbors_hist": _q_cn_histogram,
        "jaccard_gt_half_count": _q_jaccard_count,
        "bfs_levels": _q_bfs_levels,
        "connected_components": _q_components,
        "component_sizes": _q_component_sizes,
        "pagerank": _q_pagerank,
        "label_propagation": _q_label_propagation,  # rows-only (no oracle)
    }


def oracle_sql() -> dict[str, str]:
    tri_sql = f"""
WITH {EPARTS}
SELECT count(*) AS triangles
FROM eparts e1
JOIN eparts e2 ON e1.dst = e2.src
JOIN eparts e3 ON e3.src = e1.src AND e3.dst = e2.dst
"""
    return {
        "graph_edges": f"WITH {EPARTS} SELECT src, dst FROM eparts",
        "graph_degrees": f"""
WITH {EPARTS}
SELECT src AS id, count(*) AS degree FROM sym GROUP BY src
""",
        "graph_degree_stats": f"""
WITH {EPARTS},
deg AS (SELECT src AS id, count(*) AS degree FROM sym GROUP BY src)
SELECT count(*) AS num_vertices, sum(degree) AS num_directed_edges,
       round(avg(degree), 6) AS avg_degree,
       max(degree) AS max_degree, min(degree) AS min_degree
FROM deg
""",
        "graph_max_degree_vertex": f"""
WITH {EPARTS}
SELECT src AS id, count(*) AS degree FROM sym GROUP BY src
ORDER BY degree DESC, id ASC LIMIT 1
""",
        "triangle_count_join": tri_sql,
        "triangle_count_csr": tri_sql,
        "triangles_per_edge_hist": f"""
WITH {EPARTS},
per_edge AS (
  SELECT e1.src, e1.dst, count(*) AS tri_cnt
  FROM eparts e1
  JOIN eparts e2 ON e1.dst = e2.src
  JOIN eparts e3 ON e3.src = e1.src AND e3.dst = e2.dst
  GROUP BY e1.src, e1.dst
)
SELECT tri_cnt, count(*) AS num_edges FROM per_edge GROUP BY tri_cnt
""",
        "clique4_count": f"""
WITH {EPARTS},
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM eparts e1
  JOIN eparts e2 ON e1.dst = e2.src
  JOIN eparts e3 ON e3.src = e1.src AND e3.dst = e2.dst
)
SELECT count(*) AS cliques
FROM tri
JOIN eparts e4 ON e4.src = tri.c
JOIN eparts e5 ON e5.src = tri.b AND e5.dst = e4.dst
JOIN eparts e6 ON e6.src = tri.a AND e6.dst = e4.dst
""",
        "similar_nodes": f"""
WITH {EPARTS},
deg AS (SELECT src AS id, count(*) AS degree FROM sym GROUP BY src),
m AS (SELECT id FROM deg ORDER BY degree DESC, id ASC LIMIT 1),
nm AS (SELECT dst AS w FROM sym WHERE src = (SELECT id FROM m)),
cn AS (SELECT s.src AS v, count(*) AS c
       FROM sym s JOIN nm ON s.dst = nm.w GROUP BY s.src)
SELECT count(*) AS similar FROM cn WHERE c > 10
""",
        "symbiosity_directed": f"""
WITH {EFOLLOW},
outd AS (SELECT src AS id, count(*) AS outd FROM efollow GROUP BY src),
ind  AS (SELECT dst AS id, count(*) AS ind  FROM efollow GROUP BY dst),
both_ AS (SELECT a.src AS id, count(*) AS both_cnt
          FROM efollow a JOIN efollow b ON a.src = b.dst AND a.dst = b.src
          GROUP BY a.src),
j AS (
  SELECT coalesce(o.id, i.id) AS id,
         coalesce(o.outd, 0) AS od, coalesce(i.ind, 0) AS idg,
         coalesce(b.both_cnt, 0) AS bo
  FROM outd o FULL JOIN ind i ON o.id = i.id
  LEFT JOIN both_ b ON coalesce(o.id, i.id) = b.id
)
SELECT count(*) AS symbiotic
FROM j
WHERE od + idg - bo > 0
  AND CAST(bo AS DOUBLE) / (od + idg - bo) > 0.5
""",
        "common_neighbors_hist": f"""
WITH {EPARTS},
wedge AS (
  SELECT e1.src AS u, e2.src AS v, count(*) AS cn
  FROM sym e1 JOIN sym e2 ON e1.dst = e2.dst AND e1.src < e2.src
  GROUP BY e1.src, e2.src
)
SELECT cn, count(*) AS num_pairs FROM wedge GROUP BY cn
""",
        "jaccard_gt_half_count": f"""
WITH {EPARTS},
deg AS (SELECT src AS id, count(*) AS degree FROM sym GROUP BY src),
wedge AS (
  SELECT e1.src AS u, e2.src AS v, count(*) AS cn
  FROM sym e1 JOIN sym e2 ON e1.dst = e2.dst AND e1.src < e2.src
  GROUP BY e1.src, e2.src
)
SELECT count(*) AS num_similar_pairs
FROM wedge
JOIN deg du ON du.id = wedge.u
JOIN deg dv ON dv.id = wedge.v
WHERE CAST(cn AS DOUBLE) / (du.degree + dv.degree - cn) > 0.5
""",
        "bfs_levels": f"""
WITH RECURSIVE {EPARTS},
deg AS (SELECT src AS id, count(*) AS degree FROM sym GROUP BY src),
start AS (SELECT id FROM deg ORDER BY degree DESC, id ASC LIMIT 1),
lv(id, level) AS (
  SELECT id, 0 FROM start
  UNION
  SELECT s.dst, lv.level + 1 FROM lv JOIN sym s ON s.src = lv.id
  WHERE lv.level < 6
)
SELECT level, count(*) AS cnt
FROM (SELECT id, min(level) AS level FROM lv GROUP BY id)
GROUP BY level
""",
        "connected_components": f"""
WITH RECURSIVE {ESPARSE},
comp(id, comp) AS (
  SELECT id, min(m) FROM (
    SELECT src AS id, dst AS m FROM ssym
    UNION ALL SELECT src, src FROM ssym
  ) GROUP BY id
  UNION
  SELECT s.dst, min(c.comp) FROM comp c JOIN ssym s ON s.src = c.id
  GROUP BY s.dst
)
SELECT id, min(comp) AS component FROM comp GROUP BY id
""",
        "component_sizes": f"""
WITH RECURSIVE {ESPARSE},
comp(id, comp) AS (
  SELECT id, min(m) FROM (
    SELECT src AS id, dst AS m FROM ssym
    UNION ALL SELECT src, src FROM ssym
  ) GROUP BY id
  UNION
  SELECT s.dst, min(c.comp) FROM comp c JOIN ssym s ON s.src = c.id
  GROUP BY s.dst
),
assign AS (SELECT id, min(comp) AS component FROM comp GROUP BY id)
SELECT component, count(*) AS size FROM assign GROUP BY component
""",
        "pagerank": f"""
WITH RECURSIVE {EPARTS},
verts AS (SELECT DISTINCT src AS id FROM sym),
deg AS (SELECT src AS id, count(*) AS outdeg FROM sym GROUP BY src),
nv AS (SELECT count(*) AS n FROM verts),
pr(iter, id, rank) AS (
  SELECT 0, id, CAST(1.0 AS DOUBLE) / (SELECT n FROM nv) FROM verts
  UNION ALL
  SELECT pr.iter + 1, v.id,
         CAST(0.15 AS DOUBLE) / (SELECT n FROM nv)
         + CAST(0.85 AS DOUBLE) * coalesce(sum(pr.rank / d.outdeg), CAST(0 AS DOUBLE))
  FROM pr
  JOIN deg d ON d.id = pr.id
  JOIN sym s ON s.src = pr.id
  RIGHT JOIN verts v ON v.id = s.dst
  WHERE pr.iter < 10
  GROUP BY pr.iter, v.id
)
SELECT id, round(rank, 6) AS rank6 FROM pr WHERE iter = 10
""",
    }
