"""Vectorized tokenization: content -> (doc_id, term, tf, doclen) triples.

This is the analyzer half the reference delegates to Elasticsearch (dynamic
mapping of text fields on `_bulk` ingest, ElasticWriter.java:180-184). The
analyzer itself is ours, defined deterministically:

    lowercase; terms are maximal runs of [a-z0-9_]

which is a code-aware simple analyzer (underscores kept so identifiers like
``doc_id`` stay whole). The exact same rule is used by the pandas oracle,
the DuckDB oracle SQL (regexp_split_to_array on the complement class) and
the engine, so all three tokenize identically.

Hot path: pandas C string ops over Arrow batches inside ``mapInPandas`` —
no per-row Python in our code; the groupby/size aggregation is map-side
(per-batch) so the shuffle that follows carries pre-aggregated (doc, term)
counts, not raw tokens.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

TOKEN_PATTERN = r"[a-z0-9_]+"
# the same tokenization expressed as a split-regex for SQL oracles
SPLIT_PATTERN = r"[^a-z0-9_]+"

TRIPLES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("term", StringType(), False),
        StructField("tf", LongType(), False),
        StructField("doclen", LongType(), False),
    ]
)


def tokenize_pandas(pdf: pd.DataFrame, content_col: str = "content") -> pd.DataFrame:
    """One Arrow batch -> (doc_id, term, tf, doclen) rows. Pure pandas/C.

    ``doclen`` (total token count of the doc) is emitted on every triple so
    the posting builder never needs a doc_id shuffle-join back to the docs
    table — the doc length rides along with the term row.
    """
    toks = (
        pdf.set_index("doc_id")[content_col]
        .str.lower()
        .str.findall(TOKEN_PATTERN)
    )
    doclen = toks.str.len().rename("doclen")
    ex = toks.explode().dropna().rename("term")
    if ex.empty:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "term": pd.Series([], dtype="object"),
                "tf": pd.Series([], dtype="int64"),
                "doclen": pd.Series([], dtype="int64"),
            }
        )
    tf = (
        ex.groupby([ex.index, ex.values], sort=False)
        .size()
        .rename("tf")
        .rename_axis(["doc_id", "term"])
        .reset_index()
    )
    tf["doclen"] = tf["doc_id"].map(doclen).astype("int64")
    tf["doc_id"] = tf["doc_id"].astype("int64")
    tf["tf"] = tf["tf"].astype("int64")
    return tf[["doc_id", "term", "tf", "doclen"]]


def tokenize_triples(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """Distributed tokenize: docs(doc_id, content) -> triples DataFrame."""
    cols = docs.select("doc_id", content_col)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield tokenize_pandas(pdf, content_col)

    return cols.mapInPandas(fn, schema=TRIPLES_SCHEMA)
