"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, compare
row count + schema + order-insensitive values.

Usage: python tools/check_gate.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stable row order for comparison
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod
    from excelastic_spark.session import get_spark

    spark = get_spark(app_name="gate-check", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        except Exception:
            pass

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"[FAIL] {name}: spark error: {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error: {type(e).__name__}: {e}")
            failures += 1
            continue
        g, x = normalize(got), normalize(exp)
        if list(g.columns) != list(x.columns):
            print(f"[FAIL] {name}: columns {list(g.columns)} vs {list(x.columns)}")
            failures += 1
            continue
        if len(g) != len(x):
            print(f"[FAIL] {name}: rows {len(g)} vs {len(x)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(
                g, x, check_dtype=False, check_exact=True
            )
            print(f"[OK]   {name}: {len(g)} rows")
        except AssertionError as e:
            print(f"[FAIL] {name}: value mismatch\n{str(e)[:800]}")
            mism = (g != x).any(axis=1)
            print("spark:", g[mism].head(5).to_string())
            print("duck :", x[mism].head(5).to_string())
            failures += 1
    spark.stop()
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
