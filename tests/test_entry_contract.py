"""Driver-contract guards: entry() runs, every oracle key has a query,
and a spot-check of the Spark-vs-DuckDB agreement (the full matrix runs in
tools/check_gate.py)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["documents", "embeddings"]:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_keys_align():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs), set(oracles) - set(qs)
    assert len(qs) >= 20


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "score_e6"}


@pytest.mark.parametrize("name", ["bm25_or_2", "bm25_and_2", "term_stats", "lang_id"])
def test_spot_gate(spark, duck, name):
    got = entrymod.queries()[name](spark, SF).toPandas()
    exp = duck.sql(entrymod.oracle_sql()[name]).df()
    g = got.reindex(sorted(got.columns), axis=1).sort_values(
        list(sorted(got.columns)), ignore_index=True
    )
    x = exp.reindex(sorted(exp.columns), axis=1).sort_values(
        list(sorted(exp.columns)), ignore_index=True
    )
    pd.testing.assert_frame_equal(g, x, check_dtype=False, check_exact=True)
