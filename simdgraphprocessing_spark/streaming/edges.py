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


def materialize_stream(
    out: DataFrame, name: str | None = None, output_mode: str = "append"
) -> DataFrame:
    """Run a streaming plan to completion over the currently-available
    input (``trigger(availableNow=True)``) into an in-memory sink and
    return the finished batch DataFrame.

    This is the deterministic harness the tests and the driver
    correctness gate use — production jobs point ``writeStream`` at
    parquet/Kafka with a checkpointLocation instead. Append-mode
    watermark semantics apply: only windows finalized by the final
    watermark are emitted. Stateful operators that emit per-batch
    updates (``running_degree``) need ``output_mode="update"``.
    """
    import uuid

    if name is None:
        name = "stream_" + uuid.uuid4().hex[:12]
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out.sparkSession.table(name)


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


def running_degree(stream: DataFrame) -> DataFrame:
    """Cumulative per-vertex degree across micro-batches — a custom
    stateful operator via ``applyInPandasWithState`` (Arrow-batched,
    no per-row Python): state = one int64 per vertex, each batch emits
    the updated running total plus that batch's arrivals.

    This is the Spark-stateful analog of the vertex state the
    reference's iteration loops carry in RAM
    (``apps/n_path.cpp:58-83`` visited bitsets); state lives in the
    streaming state store, checkpointed and partitioned by key, so it
    scales to 10^10 vertices across executors.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        total = state.get[0] if state.exists else 0
        batch = 0
        for pdf in pdfs:
            batch += len(pdf)
        total += batch
        state.update((total,))
        yield pd.DataFrame(
            {"id": [key[0]], "degree": [total], "batch_edges": [batch]}
        )

    return stream.groupBy("src").applyInPandasWithState(
        update,
        outputStructType="id long, degree long, batch_edges long",
        stateStructType="degree long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
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
