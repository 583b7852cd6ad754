"""Corpus generator + edge-extraction ETL: deterministic round-trip
(extracted edges == generated ground truth), sha256 invariant, and
degree-ordered graph build from the corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simdgraphprocessing_spark import corpus
from simdgraphprocessing_spark.graph import Graph
from simdgraphprocessing_spark.operators import triangle_count

N_FILES = 400


@pytest.fixture(scope="module")
def repos_df(spark):
    df = corpus.make_corpus(spark, n_files=N_FILES, seed=42).persist()
    df.count()
    return df


def test_corpus_schema_and_determinism(spark, repos_df):
    assert repos_df.columns == ["repo", "path", "commit", "lang", "content"]
    assert repos_df.count() == N_FILES
    # deterministic: regenerate → identical sha set
    again = corpus.make_corpus(spark, n_files=N_FILES, seed=42)
    sha1 = {r[0] for r in repos_df.select(F.sha2("content", 256)).collect()}
    sha2_ = {r[0] for r in again.select(F.sha2("content", 256)).collect()}
    assert sha1 == sha2_
    # different seed → different corpus
    other = corpus.make_corpus(spark, n_files=N_FILES, seed=7)
    sha3 = {r[0] for r in other.select(F.sha2("content", 256)).collect()}
    assert sha1 != sha3


def test_extract_edges_round_trip(spark, repos_df):
    """Regex-extracted edges must exactly equal the generator's
    ground-truth import pairs (mapped through the same hash ids)."""
    files = corpus.file_dictionary(spark, N_FILES, seed=42)
    key = F.xxhash64(F.concat_ws(":", "repo", "path"))
    id_map = files.select(F.col("file_id"), key.alias("vid"))
    truth = (
        corpus.import_pairs(spark, N_FILES, seed=42)
        .join(id_map.withColumnRenamed("file_id", "src_file").withColumnRenamed("vid", "src"), "src_file")
        .join(id_map.withColumnRenamed("file_id", "dst_file").withColumnRenamed("vid", "dst"), "dst_file")
        .select("src", "dst")
    )
    got = corpus.extract_edges(repos_df).select("src", "dst")
    assert got.count() == truth.count()
    assert got.exceptAll(truth).count() == 0
    assert truth.exceptAll(got).count() == 0


def test_content_sha_invariant(spark, repos_df):
    edges = corpus.extract_edges(repos_df)
    assert corpus.verify_content_sha(edges, repos_df) == 0
    # corrupt one sha → violation detected
    bad = edges.limit(1).withColumn("content_sha", F.lit("deadbeef"))
    assert corpus.verify_content_sha(edges.union(bad), repos_df) == 1


def test_graph_from_corpus(spark, repos_df):
    edges = corpus.extract_edges(repos_df)
    g = Graph.from_edge_list_degree_ordered(edges)
    v = g.num_vertices()
    assert 0 < v <= N_FILES
    # dense degree-ordered ids: max id == V-1
    mx = g.edges.agg(F.max(F.greatest("src", "dst"))).collect()[0][0]
    assert mx == v - 1
    t = triangle_count(g.edges).collect()[0]["triangles"]
    assert t >= 0  # smoke: full pipeline corpus → graph → query runs


def test_repo_level_edges(spark, repos_df):
    re_ = corpus.repo_level_edges(repos_df)
    assert re_.count() > 0
    assert re_.filter(F.col("src") == F.col("dst")).count() == 0


def test_write_ligra_text(spark, tmp_path):
    from simdgraphprocessing_spark.sources.edgelist import write_ligra_text

    # 0→{1,2}, 1→{2}, 2→{}, 3→{0}  (vertex 2 has out-degree 0)
    e = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (3, 0)], "src long, dst long"
    )
    path = str(tmp_path / "g.ligra")
    write_ligra_text(e, path)
    lines = open(path).read().split()
    assert lines[0] == "AdjacencyGraph"
    n, m = int(lines[1]), int(lines[2])
    assert (n, m) == (4, 4)
    offsets = [int(x) for x in lines[3 : 3 + n]]
    nbrs = [int(x) for x in lines[3 + n : 3 + n + m]]
    assert offsets == [0, 2, 3, 3]  # exclusive prefix sum of degrees 2,1,0,1
    assert nbrs == [1, 2, 2, 0]
