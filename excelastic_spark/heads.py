"""Impact-ordered head tier: bounded-latency approximate top-k serving.

The exact driver path is O(df) per query term — profiled at seconds for
stopword-grade terms (df ~= N) on a 5M-doc index (BENCH/BASELINE.md), and
block-max pruning is structurally useless there (every block competes).
Public practice bounds the work instead of the error bars pretending
otherwise: champion lists (Manning/Raghavan/Schuetze, IIR ch. 7.1.3),
impact-ordered indexes (Anh & Moffat, "Simplified similarity scoring using
term ranks", SIGIR 2005), and anytime score-at-a-time ranking (JASS; Lin &
Trotman, SIGIR 2015). The reference's backend has the same tier in spirit:
Elasticsearch serves top-k through Lucene dynamic pruning and gives up
exact hit counts by default (track_total_hits).

Ours: for every (term, salt) postings row keep the top
``ceil(head_size / n_salts)`` postings by BUILD-time BM25 impact (ties ->
smaller doc_id), stored in the SAME doc_id-sorted delta+varint layout as
postings rows, PLUS per-row bounds on everything excluded:

* ``excl_max_tf`` — max tf among the row's excluded postings (0 = none)
* ``excl_min_dl`` — min doclen among the row's excluded postings

BM25 impact is monotone increasing in tf and decreasing in doclen for ANY
avgdl, so ``idf * impact(excl_max_tf, excl_min_dl)`` evaluated with
QUERY-time stats upper-bounds every excluded posting's weight even after
appends shift avgdl — the certificate ``QueryEngine.search_head`` uses to
report when the returned top-k set is provably exact. Salts partition docs
by hash, so the union of per-salt heads need not equal the global top-M —
but every excluded posting is covered by its own row's bound, so the
certificate stays valid regardless of how the head mass splits.

Scale shape: building the tier is ONE map-only pass over the postings
table (no shuffle — each row truncates independently in its executor);
the tier itself is <= head_size postings per term, so a search head can
hold it in page cache and serve monster-term queries in O(head_size).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from excelastic_spark import codec
from excelastic_spark.catalog import IndexStore

HEADS_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("salt", IntegerType(), False),
        StructField("n", LongType(), False),
        StructField("doc_ids", BinaryType(), False),
        StructField("tfs", BinaryType(), False),
        StructField("doclens", BinaryType(), False),
        StructField("excl_max_tf", LongType(), False),
        StructField("excl_min_dl", LongType(), False),
        StructField("bucket", IntegerType(), False),
    ]
)

DEFAULT_HEAD_SIZE = 4096


def _head_kernel(head_size: int, avgdl: float, k1: float, b: float):
    """mapInPandas kernel: one postings row -> one head row. The loop is
    over (term, salt) posting-index ROWS (never over postings — selection
    and re-encode are vectorized numpy per row). Rows whose list already
    fits the per-salt budget pass their encoded bytes through untouched."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out: dict[str, list] = {f.name: [] for f in HEADS_SCHEMA.fields}
            for _, row in pdf.iterrows():
                n = int(row["n"])
                m = max(1, math.ceil(head_size / int(row["n_salts"])))
                if n <= m:  # whole row fits: passthrough, nothing excluded
                    out["term"].append(row["term"])
                    out["salt"].append(row["salt"])
                    out["n"].append(n)
                    out["doc_ids"].append(bytes(row["doc_ids"]))
                    out["tfs"].append(bytes(row["tfs"]))
                    out["doclens"].append(bytes(row["doclens"]))
                    out["excl_max_tf"].append(0)
                    out["excl_min_dl"].append(1)
                    out["bucket"].append(row["bucket"])
                    continue
                ids = codec.decode_delta_varint(bytes(row["doc_ids"]))
                tfs = codec.decode_varint(bytes(row["tfs"]))
                dls = codec.decode_varint(bytes(row["doclens"]))
                impacts = codec.bm25_impact(tfs, dls, avgdl, k1, b)
                # deterministic head pick: (impact DESC, doc_id ASC)
                order = np.lexsort((ids, -impacts))
                keep = np.sort(order[:m])  # ids ascending within a row
                excl = order[m:]
                out["term"].append(row["term"])
                out["salt"].append(row["salt"])
                out["n"].append(int(keep.size))
                out["doc_ids"].append(codec.encode_delta_varint(ids[keep]))
                out["tfs"].append(codec.encode_varint(tfs[keep]))
                out["doclens"].append(codec.encode_varint(dls[keep]))
                out["excl_max_tf"].append(int(tfs[excl].max()))
                out["excl_min_dl"].append(int(dls[excl].min()))
                out["bucket"].append(row["bucket"])
            yield pd.DataFrame(out)

    return fn


def build_heads(
    spark: SparkSession,
    store: IndexStore,
    head_size: int = DEFAULT_HEAD_SIZE,
) -> str:
    """Derive the head tier from the committed postings table — a map-only
    executor pass (no shuffle; the broadcast n_salts join is map-side).
    The commit atomically records which postings snapshots the tier was
    derived from; any later append changes that list, and
    ``QueryEngine.search_head`` refuses a stale tier."""
    st = store.read_table(spark, "stats").collect()[0]
    avgdl, k1, b = float(st["avgdl"]), float(st["k1"]), float(st["b"])
    postings = store.read_table(spark, "postings")
    n_salts = store.read_table(spark, "terms").select("term", "n_salts")
    heads = postings.join(F.broadcast(n_salts), "term").mapInPandas(
        _head_kernel(int(head_size), avgdl, k1, b), schema=HEADS_SCHEMA
    )
    path = store.stage_table(heads, "heads", partition_by=["bucket"])
    loc = store.table_path("postings")
    store.commit_snapshot(
        [("heads", path, "overwrite")],
        stages={
            "heads": {
                "head_size": int(head_size),
                "postings": loc if isinstance(loc, list) else [loc],
            }
        },
    )
    return path
