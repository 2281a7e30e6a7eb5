"""Index build pipeline: corpus -> inverted index (postings/terms/docs/stats).

Stage layout (each stage commits a lineage entry keyed by the input
fingerprint, so a rerun resumes by skipping committed stages — the north
rule's checkpoint/resume requirement):

  validate  fail-fast dry-run (corpus.validate_corpus; analog of the
            reference's initialize() pre-parse, ExcelParser.java:90-102)
  docs      doc_id assignment + sha256 + doclen -> docs table
  terms     df/cf per term + salting plan -> terms table
  postings  salt -> shuffle on (term, salt) -> per-group vectorized
            delta+varint encode + block-max metadata -> postings table,
            parquet-partitioned by bucket(term) for lookup pruning
  stats     1-row collection stats table

Skew handling: terms with df > cfg.salt_threshold are split into
ceil(df/salt_target) salts by pmod(xxhash64(doc_id), S); ONLY the hot subset
is broadcast to the triples (the full vocabulary is never broadcast — at
10^12 docs the vocab is huge but the hot set is tiny by construction), so
the (term, salt) shuffle has bounded partition sizes. The salted sub-lists
are disjoint by doc and merged at query time (query.py).

Metrics per stage (docs/sec, terms/sec, postings/sec, bytes compressed) go
to the store's metrics.jsonl — the engine-grade analog of the reference's
progress events (ElasticWriter.java:147-156).
"""

from __future__ import annotations

import time
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from excelastic_spark import codec
from excelastic_spark.catalog import IndexStore
from excelastic_spark.config import EngineConfig
from excelastic_spark.corpus import ingest_corpus
from excelastic_spark.stats import collection_stats, term_stats
from excelastic_spark.tokenizer import tokenize_triples

POSTINGS_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("salt", IntegerType(), False),
        StructField("n", LongType(), False),
        StructField("doc_ids", BinaryType(), False),
        StructField("tfs", BinaryType(), False),
        StructField("doclens", BinaryType(), False),
        StructField("block_last", BinaryType(), False),
        StructField("block_max", BinaryType(), False),
    ]
)

STATS_SCHEMA = StructType(
    [
        StructField("n_docs", LongType(), False),
        StructField("avgdl", DoubleType(), False),
        StructField("n_terms", LongType(), False),
        StructField("k1", DoubleType(), False),
        StructField("b", DoubleType(), False),
        StructField("block_size", IntegerType(), False),
    ]
)


def bucket_expr(term_col, n_buckets: int):
    """bucket = pmod(xxhash64(term), n_buckets) — the parquet analog of an
    Iceberg bucket(term) partition transform; query.py computes the same
    expression to prune lookups to one directory."""
    return F.pmod(F.xxhash64(term_col), F.lit(n_buckets)).cast(IntegerType())


def _encode_group(cfg: EngineConfig, avgdl: float):
    """applyInPandas group encoder: one (term, salt) group -> one postings
    row. All numpy-vectorized: sort, delta+varint, block-max."""

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        term, salt = key
        order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
        doc_ids = pdf["doc_id"].to_numpy()[order].astype(np.uint64)
        tfs = pdf["tf"].to_numpy()[order].astype(np.uint64)
        dls = pdf["doclen"].to_numpy()[order].astype(np.uint64)
        impacts = codec.bm25_impact(tfs, dls, avgdl, cfg.k1, cfg.b)
        blk_last, blk_max = codec.block_metadata(doc_ids, impacts, cfg.block_size)
        return pd.DataFrame(
            {
                "term": [term],
                "salt": [int(salt)],
                "n": [int(doc_ids.size)],
                "doc_ids": [codec.encode_delta_varint(doc_ids)],
                "tfs": [codec.encode_varint(tfs)],
                "doclens": [codec.encode_varint(dls)],
                "block_last": [codec.u64_to_bytes(blk_last)],
                "block_max": [codec.f64_to_bytes(blk_max)],
            }
        )

    return fn


def corpus_fingerprint(corpus: DataFrame) -> str:
    """Cheap deterministic fingerprint of the input snapshot for lineage:
    row count + order-independent crc aggregate over content."""
    row = corpus.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.crc32(F.col("content"))).alias("crc"),
    ).collect()[0]
    return f"n={row['n']},crc={row['crc']}"


class IndexBuilder:
    def __init__(
        self, spark: SparkSession, store: IndexStore, cfg: EngineConfig | None = None
    ):
        self.spark = spark
        self.store = store
        self.cfg = cfg or EngineConfig()

    # ------------------------------------------------------------------ api

    def build(
        self,
        corpus: DataFrame,
        clear: bool = False,
        pre_ingested: bool = False,
    ) -> dict[str, Any]:
        """Full build. ``clear`` = reference --clear (drop index first,
        ElasticWriter.java:186-194 / ImportEvent.java:45). ``pre_ingested``
        means ``corpus`` already has doc_id + sha256 columns (e.g. the
        driver documents table) so doc_id assignment is skipped."""
        cfg, store, spark = self.cfg, self.store, self.spark
        if clear:
            store.drop()
        fp = corpus_fingerprint(corpus)
        metrics: dict[str, Any] = {"fingerprint": fp}

        # ---- stage: ingest (validate + ids + sha256) ----
        if not (store.stage_done("ingest", fp) and store.has_table("ingested")):
            t0 = time.time()
            ingested = corpus if pre_ingested else ingest_corpus(corpus)
            store.write_table(ingested, "ingested")
            n_docs = store.read_table(spark, "ingested").count()
            dt = time.time() - t0
            metrics["ingest"] = store.log_metrics(
                "ingest", n_docs=n_docs, sec=round(dt, 3),
                docs_per_sec=round(n_docs / max(dt, 1e-9), 1),
            )
            store.commit_stage("ingest", fp, n_docs=n_docs)

        ingested = store.read_table(spark, "ingested")

        # ---- stage: triples (tokenize ONCE, persisted for downstream
        # stages and resume — the tokenize output is itself a checkpoint) ----
        if not (store.stage_done("triples", fp) and store.has_table("triples")):
            t0 = time.time()
            store.write_table(tokenize_triples(ingested), "triples")
            n_triples = store.read_table(spark, "triples").count()
            dt = time.time() - t0
            metrics["tokenize"] = store.log_metrics(
                "tokenize", n_triples=n_triples, sec=round(dt, 3),
                triples_per_sec=round(n_triples / max(dt, 1e-9), 1),
            )
            store.commit_stage("triples", fp, n_triples=n_triples)

        triples = store.read_table(spark, "triples")

        # ---- stage: docs (attach doclen) ----
        if not (store.stage_done("docs", fp) and store.has_table("docs")):
            t0 = time.time()
            doclens = triples.groupBy("doc_id").agg(
                F.sum("tf").alias("doclen")
            )
            docs_out = ingested.join(doclens, "doc_id", "left").select(
                "doc_id",
                "repo",
                "path",
                "commit",
                "lang",
                "sha256",
                F.coalesce("doclen", F.lit(0)).cast(LongType()).alias("doclen"),
                F.col("content"),
            )
            store.write_table(docs_out, "docs")
            n_docs = store.read_table(spark, "docs").count()
            dt = time.time() - t0
            metrics["docs"] = store.log_metrics(
                "docs", n_docs=n_docs, sec=round(dt, 3),
                docs_per_sec=round(n_docs / max(dt, 1e-9), 1),
            )
            store.commit_stage("docs", fp, n_docs=n_docs)

        docs = store.read_table(spark, "docs")

        # ---- stage: terms (df/cf + salt plan) ----
        if not (store.stage_done("terms", fp) and store.has_table("terms")):
            t0 = time.time()
            ts = term_stats(triples).withColumn(
                "n_salts",
                F.when(
                    F.col("df") > cfg.salt_threshold,
                    F.ceil(F.col("df") / cfg.salt_target).cast(IntegerType()),
                ).otherwise(F.lit(1)),
            ).withColumn("bucket", bucket_expr(F.col("term"), cfg.n_buckets))
            store.write_table(ts, "terms", partition_by=["bucket"])
            n_terms = store.read_table(spark, "terms").count()
            dt = time.time() - t0
            metrics["terms"] = store.log_metrics(
                "terms", n_terms=n_terms, sec=round(dt, 3),
                terms_per_sec=round(n_terms / max(dt, 1e-9), 1),
            )
            store.commit_stage("terms", fp, n_terms=n_terms)

        terms = store.read_table(spark, "terms")

        # ---- stage: stats ----
        if not (store.stage_done("stats", fp) and store.has_table("stats")):
            n_docs, avgdl = collection_stats(docs, triples)
            n_terms = terms.count()
            stats_df = self.spark.createDataFrame(
                [(n_docs, float(avgdl), n_terms, cfg.k1, cfg.b, cfg.block_size)],
                schema=STATS_SCHEMA,
            )
            store.write_table(stats_df, "stats")
            metrics["stats"] = store.log_metrics(
                "stats", n_docs=n_docs, avgdl=avgdl, n_terms=n_terms
            )
            store.commit_stage("stats", fp)

        stats = store.read_table(spark, "stats").collect()[0]
        avgdl = stats["avgdl"]

        # ---- stage: postings ----
        if not (store.stage_done("postings", fp) and store.has_table("postings")):
            t0 = time.time()
            # broadcast ONLY the hot (salted) terms — tiny by construction
            hot = terms.filter(F.col("n_salts") > 1).select("term", "n_salts")
            salted = (
                triples.join(F.broadcast(hot), "term", "left")
                .withColumn(
                    "salt",
                    F.when(
                        F.col("n_salts").isNotNull(),
                        F.pmod(F.xxhash64(F.col("doc_id")), F.col("n_salts")),
                    )
                    .otherwise(F.lit(0))
                    .cast(IntegerType()),
                )
                .drop("n_salts")
            )
            postings = (
                salted.repartition(cfg.shuffle_partitions, "term", "salt")
                .groupBy("term", "salt")
                .applyInPandas(_encode_group(cfg, avgdl), schema=POSTINGS_SCHEMA)
                .withColumn("bucket", bucket_expr(F.col("term"), cfg.n_buckets))
            )
            store.write_table(postings, "postings", partition_by=["bucket"])
            written = store.read_table(spark, "postings")
            agg = written.agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum("n").alias("postings"),
                F.sum(
                    F.length("doc_ids")
                    + F.length("tfs")
                    + F.length("doclens")
                    + F.length("block_last")
                    + F.length("block_max")
                ).alias("bytes"),
            ).collect()[0]
            dt = time.time() - t0
            metrics["postings"] = store.log_metrics(
                "postings",
                rows=agg["rows"],
                postings=agg["postings"],
                bytes_compressed=agg["bytes"],
                sec=round(dt, 3),
                postings_per_sec=round((agg["postings"] or 0) / max(dt, 1e-9), 1),
            )
            store.commit_stage("postings", fp, rows=agg["rows"])

        return metrics
