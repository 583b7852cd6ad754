"""Structured Streaming over edge arrivals.

The reference has no streaming surface (SURVEY §2.9); this module is
the Spark-native extension for continuously-arriving edges (e.g. new
imports as commits land): watermarked event-time windows over edge
rates/degrees, and an incremental join against a static adjacency
snapshot for triangle-candidate detection.

All operators are standard ``readStream → transform → writeStream``
plans: they run identically with file, Kafka, or rate sources; tests
drive them with file sources + ``trigger(availableNow=True)`` so they
are deterministic and finite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_STREAM_SCHEMA = "src long, dst long, ts timestamp"


def read_edge_stream(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """File-source edge stream with an explicit schema (streams must
    never infer schemas — a late schema change would corrupt state)."""
    return (
        spark.readStream.format(fmt)
        .schema(EDGE_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .load(path)
    )


def windowed_degree_counts(
    stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Per-vertex out-degree per event-time window, late data bounded
    by the watermark (state is purged past it — mandatory for an
    unbounded stream)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("src").alias("id"))
        .agg(F.count("*").alias("degree"))
        .select(F.col("w.start").alias("window_start"), "id", "degree")
    )


def streaming_triangle_candidates(
    stream: DataFrame, static_adjacency: DataFrame
) -> DataFrame:
    """For each arriving edge (u,v), count common neighbors against a
    static adjacency snapshot — the streaming form of the reference's
    per-edge intersection (stream–static joins are stateless, so this
    scales with the stream rate, not the graph size).

    ``static_adjacency`` is the (id, nbrs) table from
    :func:`simdgraphprocessing_spark.graph.adjacency`.
    """
    adj_u = static_adjacency.select(
        F.col("id").alias("src"), F.col("nbrs").alias("nbrs_u")
    )
    adj_v = static_adjacency.select(
        F.col("id").alias("dst"), F.col("nbrs").alias("nbrs_v")
    )
    return (
        stream.join(adj_u, "src", "left")
        .join(adj_v, "dst", "left")
        .select(
            "src",
            "dst",
            "ts",
            F.size(
                F.array_intersect(
                    F.coalesce(F.col("nbrs_u"), F.array().cast("array<long>")),
                    F.coalesce(F.col("nbrs_v"), F.array().cast("array<long>")),
                )
            ).cast("long").alias("new_triangles"),
        )
    )
