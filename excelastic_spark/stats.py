"""Collection statistics: df/cf per term, N, avgdl.

The reference gets these for free from Elasticsearch; ours are two Catalyst
aggregations (SURVEY.md §2B B4). avgdl is defined as
total_token_count / n_docs with n_docs = count of ALL docs (docs with zero
tokens still count) — the oracle SQL and pandas oracle use the identical
definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def term_stats(triples: DataFrame) -> DataFrame:
    """term -> (df, cf). Map-side partial aggregation (Catalyst
    HashAggregate) keeps the shuffle payload at one row per (partition,
    term)."""
    return triples.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )


def collection_stats(docs: DataFrame, triples: DataFrame) -> tuple[int, float]:
    """(n_docs, avgdl). Two scalar aggregates; the triples side reuses the
    map-side-combined sum."""
    n_docs = docs.count()
    total = triples.agg(F.sum("tf").alias("t")).collect()[0]["t"] or 0
    avgdl = float(total) / n_docs if n_docs else 0.0
    return n_docs, avgdl
