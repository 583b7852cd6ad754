"""Edge-list sources/sinks — the reference's loaders re-expressed
(``MutableGraph.hpp:517-599`` text, ``:316-360`` binary;
``writeUndirectedToBinary`` ``:298-314``).

Text format: whitespace-separated ``src dst`` (optionally
``src dst attr``) per line, comments ignored — parsed with a schema'd
CSV read so the scan is vectorized and prunable. The binary
checkpoint format becomes parquet (columnar, predicate-pushdown-able,
splittable — strictly better than the reference's length-prefixed
rows at any scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_edge_list_text(spark: SparkSession, path: str, attr: bool = False) -> DataFrame:
    """Whitespace ``src dst [attr]`` text → DataFrame(src, dst[, attr])."""
    schema = "src LONG, dst LONG" + (", attr INT" if attr else "")
    df = (
        spark.read.option("delimiter", " ")
        .option("comment", "#")
        .option("mode", "DROPMALFORMED")
        .schema(schema)
        .csv(path)
    )
    return df.filter(F.col("src").isNotNull() & F.col("dst").isNotNull())


def read_edge_list_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).select("src", "dst")


def write_adjacency_parquet(edges: DataFrame, path: str, buckets: int | None = None) -> None:
    """Persist the canonical edge table, clustered by src (adjacency-
    clustered like the reference's CSR file: one vertex's neighbors
    are contiguous). ``repartition(src) + sortWithinPartitions`` gives
    run-length-friendly parquet and lets later scans prune on src."""
    out = edges.repartition(*( [buckets] if buckets else [] ), "src").sortWithinPartitions("src", "dst")
    out.write.mode("overwrite").parquet(path)
