"""Golden parity against the reference's OWN test fixtures.

Loads ``/root/reference/test/data/facebook.bin`` / ``dfacebook.bin``
through :mod:`simdgraphprocessing_spark.sources.binary` and asserts the
exact counts the reference's gtest suite asserts
(``test/undirected_triangle_counting_test.cpp:6-13`` and peers):

* triangles                 1,612,010
* 4-cliques                30,004,668
* similar nodes (N=10)            904
* symbiosity directed               0
* symbiosity undirected         4,039
* lollipops               713,455,740
* n_path length (start=0, n=4)      4

This converts "matches my own DuckDB oracle" into "matches the
reference binary-for-binary on its shipped graphs".
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

FB = "/root/reference/test/data/facebook.bin"
DFB = "/root/reference/test/data/dfacebook.bin"


@pytest.fixture(scope="module")
def fb_edges(spark):
    from simdgraphprocessing_spark.graph import normalize_edges
    from simdgraphprocessing_spark.sources import read_binary_adjacency

    e = normalize_edges(read_binary_adjacency(spark, FB)).persist()
    e.count()
    yield e
    e.unpersist()


@pytest.fixture(scope="module")
def dfb_edges(spark):
    from simdgraphprocessing_spark.sources import read_binary_adjacency

    e = read_binary_adjacency(spark, DFB, directed=True).persist()
    e.count()
    yield e
    e.unpersist()


def test_facebook_shape(fb_edges, dfb_edges):
    # 4,039 vertices / 88,234 undirected edges (SNAP ego-Facebook)
    assert fb_edges.count() == 176_468
    assert dfb_edges.count() == 88_234
    n = (
        fb_edges.select(F.col("src").alias("id"))
        .union(fb_edges.select(F.col("dst").alias("id")))
        .distinct()
        .count()
    )
    assert n == 4_039


def test_facebook_triangles_join(fb_edges):
    from simdgraphprocessing_spark.operators import triangle_count

    assert triangle_count(fb_edges, method="join").collect()[0]["triangles"] == 1_612_010


def test_facebook_triangles_csr(fb_edges):
    from simdgraphprocessing_spark.operators import triangle_count

    assert triangle_count(fb_edges, method="csr").collect()[0]["triangles"] == 1_612_010


def test_facebook_4cliques(fb_edges):
    from simdgraphprocessing_spark.operators import clique_count

    assert clique_count(fb_edges, k=4).collect()[0]["cliques"] == 30_004_668


def test_facebook_similar_nodes(fb_edges):
    from simdgraphprocessing_spark.operators import similar_nodes

    assert similar_nodes(fb_edges, threshold=10).collect()[0]["similar"] == 904


def test_facebook_symbiosity_directed(dfb_edges):
    from simdgraphprocessing_spark.graph import Graph
    from simdgraphprocessing_spark.operators import symbiosity

    g = Graph(edges=dfb_edges, directed=True)
    got = symbiosity(g.out_edges(), g.in_edges(), threshold=0.5)
    assert got.collect()[0]["symbiotic"] == 0


def test_facebook_symbiosity_undirected(fb_edges):
    from simdgraphprocessing_spark.operators import symbiosity

    # undirected mode: row == column per vertex (symbiosity_test.cpp:16-22)
    got = symbiosity(fb_edges, fb_edges, threshold=0.5)
    assert got.collect()[0]["symbiotic"] == 4_039


def test_facebook_lollipops(fb_edges):
    from simdgraphprocessing_spark.operators import lollipop_count

    assert lollipop_count(fb_edges).collect()[0]["lollipops"] == 713_455_740


def test_facebook_n_path(dfb_edges):
    from simdgraphprocessing_spark.operators.paths import n_path_length

    # Parser(4, false, 4, 0, ...) → query_depth=4, start_node=external 0
    assert n_path_length(dfb_edges, start=0, n=4) == 4
