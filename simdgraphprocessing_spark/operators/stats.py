"""Degree statistics and arg-max vertex — the reference's dataset
stats tool (``tools/print_dataset_stats.cpp:32-120``) and
``get_max_row_id`` (``SparseMatrix.hpp:134-145``)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_table(edges: DataFrame) -> DataFrame:
    return edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("degree"))


def max_degree_vertex(edges: DataFrame) -> DataFrame:
    """1-row (id, degree): highest degree, ties broken by smallest id
    (the reference's linear scan keeps the first maximum)."""
    return (
        degree_table(edges)
        .orderBy(F.col("degree").desc(), F.col("id").asc())
        .limit(1)
    )


def degree_stats(edges: DataFrame) -> DataFrame:
    """Single-row summary: vertex count, edge count, avg/max/min degree
    and approximate median (percentile_approx, exact at test scale)."""
    deg = degree_table(edges)
    return deg.agg(
        F.count("*").alias("num_vertices"),
        F.sum("degree").alias("num_directed_edges"),
        F.avg("degree").alias("avg_degree"),
        F.max("degree").alias("max_degree"),
        F.min("degree").alias("min_degree"),
        F.expr("percentile_approx(degree, 0.5)").alias("median_degree"),
    )
