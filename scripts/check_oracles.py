"""Manual driver-gate rehearsal: run queries() vs oracle_sql() at any
scale factor. Usage: python scripts/check_oracles.py [sf_dir] [names...]"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import duckdb
import pandas as pd

import __spark_entry__ as E
from simdgraphprocessing_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    return out.sort_values(by=list(out.columns), ignore_index=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check_oracles")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, osql = E.queries(), E.oracle_sql()
    failures = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spdf = qs[name](spark, sf_dir).toPandas()
            t_spark = time.time() - t0
            if name not in osql:
                print(f"  {name}: rows-only, {len(spdf)} rows, spark {t_spark:.1f}s")
                continue
            t0 = time.time()
            dpdf = con.execute(osql[name]).df()
            t_duck = time.time() - t0
            a, b = canon(spdf), canon(dpdf)
            status = "OK"
            if list(a.columns) != list(b.columns):
                status = f"SCHEMA {list(a.columns)} vs {list(b.columns)}"
            elif len(a) != len(b):
                status = f"ROWS {len(a)} vs {len(b)}"
            elif [d.kind for d in a.dtypes] != [d.kind for d in b.dtypes]:
                # dtype KIND mismatch (int vs float vs object) hash-fails
                # on the driver even when values compare equal — DuckDB
                # HUGEINT → float64 vs Spark int64 was round 2's one red
                # row. Width differences (int32 vs int64) are fine: the
                # round-2 driver hashed ann_topk green with Spark int32
                # vs DuckDB int64.
                bad = [
                    f"{c}: {a[c].dtype} vs {b[c].dtype}"
                    for c in a.columns
                    if a[c].dtype.kind != b[c].dtype.kind
                ]
                status = f"DTYPE {bad}"
            else:
                for col in a.columns:
                    for i, (x, y) in enumerate(zip(a[col].tolist(), b[col].tolist())):
                        fx = isinstance(x, float) or isinstance(y, float)
                        ok = (fx and math.isnan(x) and math.isnan(y)) or x == y
                        if not ok:
                            status = f"VALUE {col}[{i}]: {x!r} != {y!r}"
                            break
                    if status != "OK":
                        break
            if status != "OK":
                failures.append(name)
            print(f"  {name}: {status} ({len(a)} rows, spark {t_spark:.1f}s duck {t_duck:.1f}s)")
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"  {name}: EXCEPTION {exc}")
    print("FAILURES:", failures or "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
