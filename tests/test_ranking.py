"""Two-pass scalable global ranking vs the single-window oracle."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from simdgraphprocessing_spark.functions.ranking import global_row_number


def test_global_row_number_matches_window(spark):
    # keys with heavy ties to force cross-partition tie-breaking
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    got = global_row_number(
        df, [F.col("k").desc(), F.col("id").asc()], out_col="rk"
    )
    want = df.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.col("k").desc(), F.col("id").asc())) - 1
    )
    assert got.join(want, ["id", "k", "rk"]).count() == 10_000


def test_global_row_number_start_offset(spark):
    df = spark.range(100)
    got = global_row_number(df, [F.col("id").asc()], out_col="r", start=1)
    rows = {r["id"]: r["r"] for r in got.collect()}
    assert rows[0] == 1 and rows[99] == 100


def test_global_row_number_no_single_partition_exchange(spark):
    df = spark.range(1000).select(F.col("id"), (F.col("id") % 3).alias("k"))
    plan = global_row_number(
        df, [F.col("k").asc(), F.col("id").asc()], out_col="r"
    )._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
