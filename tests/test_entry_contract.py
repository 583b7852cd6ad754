"""Replicates the driver's correctness gate locally: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet, then compare row count + schema-sorted values.

Runs at sf0.001 for speed; the driver runs the same contract at
sf0.01 (scripts/check_oracles.py runs it manually at any sf).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    a, b = canon(spark_pdf), canon(duck_pdf)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} vs {list(b.columns)}"
    assert len(a) == len(b), f"{name}: rows {len(a)} vs {len(b)}"
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) or isinstance(y, float):
                ok = (math.isnan(x) and math.isnan(y)) or x == y
            else:
                ok = x == y
            assert ok, f"{name}.{col}[{i}]: {x!r} != {y!r}"


ORACLES = E.oracle_sql()
QUERIES = E.queries()


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    spark_df = QUERIES[name](spark, SF_DIR)
    spark_pdf = spark_df.toPandas()
    con = duck()
    duck_pdf = con.execute(ORACLES[name]).df()
    con.close()
    compare(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["triangles"] == 125968
