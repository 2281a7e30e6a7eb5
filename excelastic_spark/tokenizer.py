"""Vectorized tokenization: content -> (doc_id, term, tf, doclen) triples.

This is the analyzer half the reference delegates to Elasticsearch (dynamic
mapping of text fields on `_bulk` ingest, ElasticWriter.java:180-184). The
analyzer itself is ours, defined deterministically:

    lowercase; terms are maximal runs of [a-z0-9_]

which is a code-aware simple analyzer (underscores kept so identifiers like
``doc_id`` stay whole). The exact same rule is used by the pandas oracle,
the DuckDB oracle SQL (regexp_split_to_array on the complement class) and
the engine, so all three tokenize identically.

Hot path: ``mapInArrow`` — strings NEVER convert to Python/pandas objects.
Per batch: Arrow C++ lower + regex-split + flatten + dictionary-encode,
then one Arrow hash-groupby over (row, term-code) int columns; doclens via
np.bincount. The per-batch aggregation is map-side, so the shuffle that
follows carries pre-aggregated (doc, term) counts, not raw tokens. (The
previous pandas ``str.findall`` kernel survives as ``tokenize_pandas`` for
the driver-side oracle; the Arrow kernel is ~20% faster at the scaling
bench's single-core level and byte-identical in output.)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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


def tokenize_arrow_batch(ids: pa.Array, content: pa.Array) -> pa.Table:
    """One Arrow batch -> (doc_id, term, tf, doclen) rows, all C-side:
    regex split in Arrow, terms dictionary-encoded so the (row, term)
    grouping hashes two INT columns, never strings."""
    low = pc.utf8_lower(content)
    toks = pc.split_pattern_regex(low, SPLIT_PATTERN)
    parent = pc.list_parent_indices(toks)
    flat = pc.list_flatten(toks)
    mask = pc.greater(pc.binary_length(flat), 0)
    flat = pc.array_filter(flat, mask)
    parent = pc.array_filter(parent, mask)
    codes = flat.dictionary_encode()
    grouped = pa.TableGroupBy(
        pa.table(
            {"p": parent, "c": pa.array(np.asarray(codes.indices))}
        ),
        ["p", "c"],
        use_threads=False,  # parallelism belongs to Spark tasks
    ).aggregate([([], "count_all")])
    p = grouped.column("p").to_numpy()
    doclen = np.bincount(
        parent.to_numpy(), minlength=len(content)
    ).astype(np.int64)
    return pa.table(
        {
            "doc_id": pc.take(ids, grouped.column("p")),
            "term": pc.take(codes.dictionary, grouped.column("c")),
            "tf": grouped.column("count_all").cast(pa.int64()),
            "doclen": pa.array(doclen[p]),
        }
    )


def tokenize_triples(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """Distributed tokenize: docs(doc_id, content) -> triples DataFrame."""
    cols = docs.select("doc_id", F.col(content_col).alias("content"))

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            out = tokenize_arrow_batch(batch.column(0), batch.column(1))
            yield from out.combine_chunks().to_batches()

    return cols.mapInArrow(fn, schema=TRIPLES_SCHEMA)
