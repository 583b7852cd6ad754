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


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_eager_mode_leaks_no_session_caches(spark):
    """ADVICE r2: _RANK_CACHES pinned a V-sized persisted DataFrame per
    call for the whole session. eager=True (the default) must leave the
    registry empty and must not grow executor storage call over call."""
    import gc

    from simdgraphprocessing_spark.functions import ranking

    ranking.release_rank_caches()
    gc.collect()
    # RELATIVE bound: the session is shared with other tests that may
    # legitimately hold persisted RDDs — measure only what THIS loop adds
    base = _n_persistent(spark)
    df = spark.range(5_000).select(F.col("id"), (F.col("id") % 5).alias("k"))
    counts = []
    for _ in range(4):
        out = global_row_number(df, [F.col("k").asc(), F.col("id").asc()])
        out.count()
        assert ranking._RANK_CACHES == []  # nothing registered in eager mode
        del out
        gc.collect()
        counts.append(_n_persistent(spark))
    # Deterministic bound: each call may leave AT MOST its one
    # localCheckpoint RDD (caller-owned result data, reclaimed by the
    # async ContextCleaner after JVM GC — not awaitable reliably in a
    # test). The regression this guards (ADVICE r2): the range-
    # partitioned INPUT persists being pinned too, which would show as
    # TWO blocks per call.
    assert _n_persistent(spark) - base <= len(counts), (base, counts)


def test_lazy_mode_registers_and_release_unpersists(spark):
    from simdgraphprocessing_spark.functions import ranking

    ranking.release_rank_caches()
    df = spark.range(1_000)
    out = global_row_number(df, [F.col("id").asc()], eager=False)
    out.count()
    assert len(ranking._RANK_CACHES) == 1
    assert ranking.release_rank_caches() == 1
    assert ranking._RANK_CACHES == []
