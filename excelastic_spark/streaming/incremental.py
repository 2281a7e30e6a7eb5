"""Incremental / streaming index maintenance: segment appends + merge.

The reference's "add to existing index" mode (radio add vs clear,
ImportEvent.java:45,62; ElasticWriter only DELETEs when clear is set,
ElasticWriter.java:59,186-194) maps to Iceberg-style segment appends: each
increment writes NEW postings rows (a segment) and a merge job compacts
segments per term — the Lucene segment-merge model (public), re-expressed
as a Spark batch job (SURVEY.md §2B B3/B11).

Streaming ingest uses Structured Streaming's file source + foreachBatch:
every micro-batch runs the SAME deterministic ingest/tokenize/encode
kernels as the batch builder (exactly-once per file via the streaming
checkpoint; doc_ids offset by the running doc count so appends never
collide).

Correctness under appends: query-side weights are always computed from the
decoded (tf, doclen) and the CURRENT stats table, and block bounds are
recomputed at lookup (query.py), so scores stay exact as avgdl/df drift;
merge + stats refresh restore optimal layout.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType

from excelastic_spark.build import (
    POSTINGS_SCHEMA,
    STATS_SCHEMA,
    _encode_partition,
    bucket_expr,
)
from excelastic_spark.catalog import IndexStore
from excelastic_spark.config import EngineConfig
from excelastic_spark.corpus import CORPUS_SCHEMA, assign_doc_ids
from excelastic_spark.tokenizer import tokenize_triples


class IncrementalIndexer:
    """Append increments to an existing index and compact them."""

    def __init__(
        self, spark: SparkSession, store: IndexStore, cfg: EngineConfig | None = None
    ):
        self.spark = spark
        self.store = store
        # inherit the index's persisted layout params (see catalog.save_config)
        self.cfg = EngineConfig.from_store(store, cfg)

    # ------------------------------------------------------------- append

    def _current_n_docs(self) -> int:
        if not self.store.has_table("stats"):
            return 0
        return int(
            self.store.read_table(self.spark, "stats").collect()[0]["n_docs"]
        )

    def append_increment(self, increment: DataFrame) -> dict[str, Any]:
        """One increment (same corpus schema) -> new docs/triples/postings
        segments + refreshed stats. doc_ids continue after the existing
        max so segments are doc-disjoint."""
        spark, store, cfg = self.spark, self.store, self.cfg
        t0 = time.time()
        base = self._current_n_docs()
        with_ids = assign_doc_ids(increment, partitions=cfg.shuffle_partitions)
        ingested = with_ids.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(base)).cast(LongType())
        ).withColumn("sha256", F.sha2(F.col("content"), 256))
        store.write_table(ingested, "ingested", mode="append")
        # read the appended snapshot back so downstream stages scan parquet,
        # not the (possibly expensive) increment lineage
        all_ingested = store.read_table(spark, "ingested")
        seg = all_ingested.filter(F.col("doc_id") >= base)

        triples = tokenize_triples(seg)
        store.write_table(triples, "triples", mode="append")
        seg_triples = store.read_table(spark, "triples").filter(
            F.col("doc_id") >= base
        )
        doclens = seg_triples.groupBy("doc_id").agg(F.sum("tf").alias("doclen"))
        docs_out = seg.join(doclens, "doc_id", "left").select(
            "doc_id", "repo", "path", "commit", "lang", "sha256",
            F.coalesce("doclen", F.lit(0)).cast(LongType()).alias("doclen"),
        )
        store.write_table(docs_out, "docs", mode="append")

        # postings segment: encode with the same kernel; stats refreshed after
        stats = self._refresh_stats()
        seg_postings = (
            seg_triples.withColumn("salt", F.lit(0).cast(IntegerType()))
            .repartition(cfg.shuffle_partitions, "term", "salt")
            .mapInPandas(
                _encode_partition(cfg, stats["avgdl"]), schema=POSTINGS_SCHEMA
            )
            .withColumn("bucket", bucket_expr(F.col("term"), cfg.n_buckets))
            .repartition(cfg.n_buckets, "bucket")
        )
        store.write_table(seg_postings, "postings", mode="append",
                          partition_by=["bucket"])
        # terms table must reflect merged df for salting/query idf
        self._refresh_terms()
        rec = self.store.log_metrics(
            "append", n_new_docs=seg.count(), sec=round(time.time() - t0, 3)
        )
        return rec

    def _refresh_terms(self) -> None:
        spark, store, cfg = self.spark, self.store, self.cfg
        triples = store.read_table(spark, "triples")
        ts = (
            triples.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf"))
            .withColumn(
                "n_salts",
                F.when(
                    F.col("df") > cfg.salt_threshold,
                    F.ceil(F.col("df") / cfg.salt_target).cast(IntegerType()),
                ).otherwise(F.lit(1)),
            )
            .withColumn("bucket", bucket_expr(F.col("term"), cfg.n_buckets))
        )
        store.write_table(ts, "terms", partition_by=["bucket"])

    def _refresh_stats(self) -> dict[str, Any]:
        spark, store, cfg = self.spark, self.store, self.cfg
        docs = store.read_table(spark, "docs") if store.has_table("docs") else None
        triples = store.read_table(spark, "triples")
        agg = triples.agg(
            F.sum("tf").alias("total"), F.count_distinct("term").alias("n_terms")
        ).collect()[0]
        n_docs = docs.count() if docs is not None else 0
        avgdl = float(agg["total"] or 0) / n_docs if n_docs else 0.0
        stats_df = spark.createDataFrame(
            [(n_docs, avgdl, int(agg["n_terms"] or 0), cfg.k1, cfg.b, cfg.block_size)],
            schema=STATS_SCHEMA,
        )
        store.write_table(stats_df, "stats")
        return {"n_docs": n_docs, "avgdl": avgdl}

    # -------------------------------------------------------------- merge

    def merge_segments(self) -> dict[str, Any]:
        """Compact multi-segment postings: decode appended rows back to
        triples, re-encode through the SAME sorted-run kernel (order-
        preserving by doc_id), re-apply the salting plan from the refreshed
        terms table. One job; snapshot-swapped by the manifest, so readers
        never see a half-merged index."""
        spark, store, cfg = self.spark, self.store, self.cfg
        t0 = time.time()
        triples = store.read_table(spark, "triples")
        stats = store.read_table(spark, "stats").collect()[0]
        terms = store.read_table(spark, "terms")
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
            .mapInPandas(
                _encode_partition(cfg, float(stats["avgdl"])),
                schema=POSTINGS_SCHEMA,
            )
            .withColumn("bucket", bucket_expr(F.col("term"), cfg.n_buckets))
            .repartition(cfg.n_buckets, "bucket")
        )
        store.write_table(postings, "postings", partition_by=["bucket"])
        rec = store.log_metrics("merge", sec=round(time.time() - t0, 3))
        return rec

    # ---------------------------------------------------------- streaming

    def stream_from_directory(
        self, input_dir: str, checkpoint_dir: str, trigger_once: bool = True
    ):
        """Structured Streaming file-source ingest: new corpus parquet files
        landing in ``input_dir`` are appended to the index exactly once
        (streaming checkpoint tracks consumed files). foreachBatch bridges
        to the deterministic batch kernels."""
        stream = (
            self.spark.readStream.schema(CORPUS_SCHEMA)
            .parquet(input_dir)
        )

        def process(batch_df: DataFrame, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            self.append_increment(batch_df)

        writer = (
            stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
