"""Streaming operators (availableNow, deterministic) and vertex
reorderings."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from simdgraphprocessing_spark.functions import (
    reorder_by_degree,
    reorder_by_rev_degree,
    reorder_random,
    reorder_strong_run,
)
from simdgraphprocessing_spark.graph import adjacency, reassign_ids
from simdgraphprocessing_spark.operators import triangle_count
from simdgraphprocessing_spark.streaming import (
    read_edge_stream,
    streaming_triangle_candidates,
    windowed_degree_counts,
)
from tests.conftest import edge_df, two_triangles_bridge_pairs, zipf_random_pairs


@pytest.fixture()
def edge_files(spark, tmp_path):
    base = dt.datetime(2026, 1, 1)
    rows = []
    for i, (a, b) in enumerate(two_triangles_bridge_pairs()):
        rows.append((a, b, base + dt.timedelta(minutes=30 * i)))
    df = spark.createDataFrame(rows, "src long, dst long, ts timestamp")
    path = str(tmp_path / "edges_in")
    df.write.parquet(path)
    return path, df


def run_available_now(stream_df, tmp_path, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if name == "tri" else "complete")
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_degree_counts(spark, tmp_path, edge_files):
    path, batch_df = edge_files
    stream = read_edge_stream(spark, path)
    out = windowed_degree_counts(stream, window="1 hour", watermark="2 hours")
    run_available_now(out, tmp_path, "deg")
    got = spark.sql("SELECT * FROM deg").collect()
    # oracle: same agg on the batch DataFrame
    expect = (
        batch_df.groupBy(F.window("ts", "1 hour").alias("w"), F.col("src").alias("id"))
        .agg(F.count("*").alias("degree"))
        .select(F.col("w.start").alias("window_start"), "id", "degree")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, expect))


def test_streaming_triangle_candidates(spark, tmp_path, edge_files):
    path, batch_df = edge_files
    adj = adjacency(edge_df(spark, two_triangles_bridge_pairs()))
    stream = read_edge_stream(spark, path)
    out = streaming_triangle_candidates(stream, adj)
    run_available_now(out, tmp_path, "tri")
    got = {(r["src"], r["dst"]): r["new_triangles"] for r in spark.sql("SELECT * FROM tri").collect()}
    # edge (0,1): common nbrs of 0 and 1 = {2} → 1; bridge (2,3) → 0
    assert got[(0, 1)] == 1 and got[(2, 3)] == 0
    assert len(got) == len(two_triangles_bridge_pairs())


def test_reorderings_preserve_graph(spark):
    pairs = zipf_random_pairs(n=120)
    e = edge_df(spark, pairs)
    base = triangle_count(e).collect()[0]["triangles"]
    for fn in (reorder_by_degree, reorder_by_rev_degree, reorder_strong_run, reorder_random):
        mapping = fn(e)
        # bijection onto [0, V)
        n = mapping.count()
        assert mapping.select("new_id").distinct().count() == n
        assert mapping.agg(F.max("new_id")).collect()[0][0] == n - 1
        remapped = reassign_ids(e, mapping)
        assert triangle_count(remapped).collect()[0]["triangles"] == base


def test_rev_degree_order_is_reversed(spark):
    e = edge_df(spark, two_triangles_bridge_pairs())
    d = {r["id"]: r["new_id"] for r in reorder_by_degree(e).collect()}
    r = {r["id"]: r["new_id"] for r in reorder_by_rev_degree(e).collect()}
    assert d[2] == 0  # max-degree vertex first
    assert r[2] == 5 or r[3] == 5  # max-degree vertex last (tie 2/3)
