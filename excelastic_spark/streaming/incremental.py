"""Incremental / streaming index maintenance: segment appends + merge.

The reference's "add to existing index" mode (radio add vs clear,
ImportEvent.java:45,62; ElasticWriter only DELETEs when clear is set,
ElasticWriter.java:59,186-194) maps to Iceberg-style segment appends: each
increment writes NEW postings rows (a segment) and a merge job compacts
segments per term — the Lucene segment-merge model (public), re-expressed
as a Spark batch job (SURVEY.md §2B B3/B11).

Cost model (the 100 TB requirement):

* ``append_increment`` is **O(increment + vocabulary)**, never O(index):
  the increment is tokenized/encoded through the same kernels as the full
  build, its term stats are merged into the existing terms table
  (vocab-sized, tiny next to the corpus), and collection stats advance from
  running totals kept in the manifest — the triples/docs/postings tables
  are appended to but NEVER re-read.
* ``merge_segments`` is **O(postings bytes)**, never O(corpus): appended
  posting rows are DECODED back to (doc_id, term, tf, doclen) rows in
  executors and re-encoded through the shared sorted-run kernel (which also
  re-applies the salting plan from the current terms table). No
  re-tokenization, no triples read — the Lucene merge model, where merge
  cost is proportional to the segments being merged.

Streaming ingest uses Structured Streaming's file source + foreachBatch:
every micro-batch runs the SAME deterministic ingest/tokenize/encode
kernels as the batch builder (exactly-once per file via the streaming
checkpoint; doc_ids offset by the running totals so appends never collide).

Correctness under appends: query-side weights are always computed from the
decoded (tf, doclen) and the CURRENT stats table, and block bounds are
recomputed at lookup (query.py), so scores stay exact as avgdl/df drift;
merge restores the compact one-row-per-(term, salt) layout.
"""

from __future__ import annotations

import os
import time
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType

from excelastic_spark import codec
from excelastic_spark.build import (
    STATS_SCHEMA,
    encode_postings,
    validate_and_fingerprint,
)
from excelastic_spark.catalog import IndexStore
from excelastic_spark.config import EngineConfig
from excelastic_spark.corpus import CORPUS_SCHEMA, assign_doc_ids
from excelastic_spark.tokenizer import TRIPLES_SCHEMA, tokenize_triples


# flush decoded triples to Spark at this many postings: an input Arrow
# batch can hold thousands of posting ROWS and a hot salted row carries
# ~salt_target postings, so materializing a whole input batch as one
# pandas frame could be O(batch rows x salt_target) — the same executor-
# memory cliff the build-side encoder was rewritten to avoid. Bounding
# the output frame keeps merge memory O(budget + largest row).
_DECODE_FLUSH_POSTINGS = 2_000_000


def _decode_rows_to_triples(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Posting rows -> (doc_id, term, tf, doclen) rows. The loop is over
    (term, salt, segment) index ROWS — a handful per term — while each
    decode is one vectorized numpy pass over that row's postings (the same
    allowlisted pattern as the query-side decode, query.py)."""

    def frame(ids_all, terms_all, tfs_all, dls_all) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(ids_all),
                "term": np.concatenate(terms_all),
                "tf": np.concatenate(tfs_all),
                "doclen": np.concatenate(dls_all),
            }
        )

    for pdf in batches:
        ids_all, terms_all, tfs_all, dls_all = [], [], [], []
        pending = 0
        for _, row in pdf.iterrows():
            ids = codec.decode_delta_varint(bytes(row["doc_ids"]))
            tfs = codec.decode_varint(bytes(row["tfs"]))
            dls = codec.decode_varint(bytes(row["doclens"]))
            ids_all.append(ids.astype(np.int64))
            tfs_all.append(tfs.astype(np.int64))
            dls_all.append(dls.astype(np.int64))
            terms_all.append(np.repeat(row["term"], ids.size))
            pending += int(ids.size)
            if pending >= _DECODE_FLUSH_POSTINGS:
                yield frame(ids_all, terms_all, tfs_all, dls_all)
                ids_all, terms_all, tfs_all, dls_all = [], [], [], []
                pending = 0
        if ids_all:
            yield frame(ids_all, terms_all, tfs_all, dls_all)


class IncrementalIndexer:
    """Append increments to an existing index and compact them."""

    def __init__(
        self, spark: SparkSession, store: IndexStore, cfg: EngineConfig | None = None
    ):
        self.spark = spark
        self.store = store
        # inherit the index's persisted layout params (see catalog.save_config)
        self.cfg = EngineConfig.from_store(store, cfg)

    # ------------------------------------------------------------- totals

    def _totals(self) -> dict[str, int]:
        """Running (n_docs, total_tf, max_doc_id) — manifest first (written
        by build/finalize/previous appends), falling back to the stats
        table + stage entries for indexes from older layouts."""
        st = self.store.manifest()["stages"]
        tot = st.get("totals")
        if tot and "n_docs" in tot and "total_tf" in tot:
            return {
                "n_docs": int(tot["n_docs"]),
                "total_tf": int(tot["total_tf"]),
                "max_doc_id": int(tot.get("max_doc_id", tot["n_docs"] - 1)),
            }
        if not self.store.has_table("stats"):
            return {"n_docs": 0, "total_tf": 0, "max_doc_id": -1}
        srow = self.store.read_table(self.spark, "stats").collect()[0]
        n_docs = int(srow["n_docs"])
        total_tf = st.get("triples", {}).get("total_tf")
        if total_tf is None:
            # avgdl was computed as total_tf / n_docs in float64; n_docs is
            # small enough that the rounding recovers the exact integer
            total_tf = round(float(srow["avgdl"]) * n_docs)
        # older-layout fallback: doc_ids need not be dense (a pre_ingested
        # build can carry gaps), so assuming max = n_docs - 1 could assign
        # the next append a COLLIDING id — read the true max from the docs
        # table's doc_id column (one columnar agg, fallback path only)
        if self.store.has_table("docs"):
            mrow = (
                self.store.read_table(self.spark, "docs")
                .agg(F.max("doc_id").alias("m"))
                .collect()[0]
            )
            max_id = int(mrow["m"]) if mrow["m"] is not None else n_docs - 1
        else:
            max_id = n_docs - 1
        return {
            "n_docs": n_docs,
            "total_tf": int(total_tf),
            "max_doc_id": max_id,
        }

    def append_increment(
        self,
        increment: DataFrame,
        pre_ingested: bool = False,
        stream_batch: tuple[str, int] | None = None,
    ) -> dict[str, Any]:
        """One increment (corpus schema) -> new docs/triples/postings
        SEGMENTS + merged terms + advanced stats. O(increment + vocab):
        only the new segment parquet (written then read back, so downstream
        stages scan parquet not the increment's lineage) and the terms
        table are ever scanned — never the existing triples/docs/postings.

        ``pre_ingested``: increment already carries doc_id + sha256; its
        doc_ids must all exceed the index's current max (doc-disjoint
        segments are what make append/merge/query correct).

        ``stream_batch``: ``(checkpoint_id, batch_id)`` when called from a
        Structured Streaming foreachBatch sink. The id pair is recorded in
        the SAME atomic manifest swap as the data, which is what upgrades
        foreachBatch's at-least-once to exactly-once: if the process dies
        after this commit but before the streaming checkpoint advances, the
        restarted drain re-offers the same batch_id and
        :meth:`stream_batch_applied` tells the sink to skip it (the
        standard idempotent-foreachBatch pattern).

        Crash safety: every table write is STAGED (snapshot dirs invisible
        to readers) and the whole append publishes in ONE manifest swap
        (catalog.commit_snapshot) — segments, merged terms, advanced stats
        and the running totals become visible together or not at all. A
        crash mid-append leaves the index untouched (plus orphan dirs that
        ``store.vacuum()`` reclaims), so the SAME append can simply be
        retried: totals never advanced, so the doc_id disjointness guard and
        id assignment see the pre-append state.

        Concurrency: the whole append holds the store's cross-process
        ``writer_lock`` — two concurrent appends would otherwise both read
        the same running totals and assign COLLIDING doc_ids (and the
        second commit would clobber the first's totals). Appends to one
        index therefore serialize, the same discipline Iceberg enforces
        with commit conflicts; shard-parallel builds don't need the lock
        because their ids come pre-assigned from the plan."""
        with self.store.writer_lock():
            return self._append_locked(increment, pre_ingested, stream_batch)

    def _append_locked(
        self,
        increment: DataFrame,
        pre_ingested: bool,
        stream_batch: tuple[str, int] | None,
    ) -> dict[str, Any]:
        spark, store, cfg = self.spark, self.store, self.cfg
        t0 = time.time()
        # fail-fast dry-run, same as the batch build (ExcelParser
        # initialize() analog): null keys/content and WITHIN-increment
        # duplicate keys abort before anything is staged. Keys that already
        # exist in the index are NOT rejected — the reference appends to ES
        # via _bulk with auto-generated ids (ElasticWriter.java:180-184), so
        # re-importing a file duplicates rows there too; exact dedup is the
        # dedup_exact operator's job, not the ingest path's.
        validate_and_fingerprint(increment, pre_ingested=pre_ingested)
        tot = self._totals()
        next_id = tot["max_doc_id"] + 1
        if pre_ingested:
            ingested = increment
            # disjointness guard BEFORE any segment write (one pass over the
            # increment only): overlapping doc_ids would silently corrupt
            # the doc-disjoint segment invariant append/merge/query rely on
            g = ingested.agg(F.min("doc_id").alias("min_id")).collect()[0]
            if g["min_id"] is not None and g["min_id"] < next_id:
                raise ValueError(
                    f"pre_ingested increment doc_ids start at {g['min_id']} "
                    f"but the index already contains ids up to {next_id - 1}"
                )
        else:
            with_ids = assign_doc_ids(increment, partitions=cfg.shuffle_partitions)
            ingested = with_ids.withColumn(
                "doc_id", (F.col("doc_id") + F.lit(next_id)).cast(LongType())
            ).withColumn("sha256", F.sha2(F.col("content"), 256))
        writes: list[tuple[str, str, str]] = []
        seg_path = store.stage_table(ingested, "ingested")
        writes.append(("ingested", seg_path, "append"))
        seg = spark.read.parquet(seg_path)

        tri_path = store.stage_table(tokenize_triples(seg), "triples")
        writes.append(("triples", tri_path, "append"))
        seg_triples = spark.read.parquet(tri_path)

        # segment agg: doc count / min id / total_tf in ONE pass over the
        # segment triples (plus segment docs without triples via the join)
        doclens = seg_triples.groupBy("doc_id").agg(F.sum("tf").alias("doclen"))
        docs_out = seg.join(doclens, "doc_id", "left").select(
            "doc_id", "repo", "path", "commit", "lang", "sha256",
            F.coalesce("doclen", F.lit(0)).cast(LongType()).alias("doclen"),
        )
        writes.append(("docs", store.stage_table(docs_out, "docs"), "append"))
        seg_agg = seg.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        ).collect()[0]
        tf_agg = seg_triples.agg(F.sum("tf").alias("tf")).collect()[0]
        inc_docs = int(seg_agg["n"])
        inc_tf = int(tf_agg["tf"] or 0)

        # ---- terms: merge increment stats into the EXISTING terms table
        # (vocab-sized — the sharded.finalize pattern), never the triples
        inc_terms = seg_triples.groupBy("term").agg(
            F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
        )
        if store.has_table("terms"):
            old = store.read_table(spark, "terms").select("term", "df", "cf")
            merged_raw = old.unionByName(inc_terms).groupBy("term").agg(
                F.sum("df").alias("df"), F.sum("cf").alias("cf")
            )
        else:
            merged_raw = inc_terms
        merged = self._plan_salts(merged_raw)
        # n_terms observed INSIDE the staging write (build._write_observed
        # pattern): a separate .count() would run the vocab-sized old-terms
        # union + groupBy twice per append
        from pyspark.sql import Observation

        obs = Observation("obs_terms_append")
        writes.append((
            "terms",
            store.stage_table(
                merged.repartition(cfg.n_buckets, "bucket").observe(
                    obs, F.count(F.lit(1)).alias("n")
                ),
                "terms",
                partition_by=["bucket"],
            ),
            "overwrite",
        ))
        n_terms = int(obs.get["n"])

        # ---- stats from running totals (no index scan)
        n_docs = tot["n_docs"] + inc_docs
        total_tf = tot["total_tf"] + inc_tf
        avgdl = float(total_tf) / n_docs if n_docs else 0.0
        stats_df = spark.createDataFrame(
            [(n_docs, avgdl, n_terms, cfg.k1, cfg.b, cfg.block_size)],
            schema=STATS_SCHEMA,
        )
        writes.append(("stats", store.stage_table(stats_df, "stats"), "overwrite"))

        # ---- postings segment: same shared kernel; salting plan from the
        # MERGED terms (a term that just went hot salts its new segment)
        seg_postings = encode_postings(seg_triples, merged, cfg, avgdl)
        writes.append((
            "postings",
            store.stage_table(seg_postings, "postings", partition_by=["bucket"]),
            "append",
        ))

        # ---- single atomic publish: segments + terms + stats + totals
        # (+ layout config when this increment CREATES the index — e.g.
        # streaming into a fresh drop-dir index — so later query/append
        # sessions recover the same bucket/salt/block layout)
        stages: dict[str, dict[str, Any]] = {
            "totals": {
                "fingerprint": "append",
                "n_docs": n_docs,
                "total_tf": total_tf,
                "max_doc_id": (
                    int(seg_agg["max_id"]) if inc_docs else tot["max_doc_id"]
                ),
            }
        }
        if stream_batch is not None:
            ckpt, batch_id = stream_batch
            stages["stream"] = {
                "fingerprint": str(ckpt),
                "last_batch_id": int(batch_id),
            }
        store.commit_snapshot(
            writes,
            config=(None if store.load_config() else cfg.layout_dict()),
            stages=stages,
        )
        rec = self.store.log_metrics(
            "append", n_new_docs=inc_docs, new_tokens=inc_tf,
            sec=round(time.time() - t0, 3),
        )
        return rec

    def _plan_salts(self, term_counts: DataFrame) -> DataFrame:
        """(term, df, cf) -> full terms-table shape (n_salts, bucket)."""
        from excelastic_spark.build import bucket_expr

        cfg = self.cfg
        return (
            term_counts.withColumn(
                "n_salts",
                F.when(
                    F.col("df") > cfg.salt_threshold,
                    F.ceil(F.col("df") / cfg.salt_target).cast(IntegerType()),
                ).otherwise(F.lit(1)),
            )
            .withColumn("bucket", bucket_expr(F.col("term"), cfg.n_buckets))
        )

    # -------------------------------------------------------------- merge

    def merge_segments(self) -> dict[str, Any]:
        """Compact multi-segment postings WITHOUT touching the corpus or
        triples: decode the appended posting rows back to triples rows in
        executors (O(postings bytes) input), then re-encode through the
        shared sorted-run kernel, re-applying the salting plan from the
        current terms table. Snapshot-swapped by the manifest, so readers
        never see a half-merged index.

        Concurrency: holds the store's ``writer_lock`` for the whole
        read-encode-overwrite — without it, a segment appended between the
        postings read and the overwrite commit would be silently dropped
        from the table path list (its docs/stats stay committed, so those
        documents would vanish from query results with no error)."""
        spark, store, cfg = self.spark, self.store, self.cfg
        t0 = time.time()
        with store.writer_lock():
            stats = store.read_table(spark, "stats").collect()[0]
            terms = store.read_table(spark, "terms")
            postings = store.read_table(spark, "postings").select(
                "term", "doc_ids", "tfs", "doclens"
            )
            decoded = postings.mapInPandas(
                _decode_rows_to_triples, schema=TRIPLES_SCHEMA
            )
            merged = encode_postings(decoded, terms, cfg, float(stats["avgdl"]))
            store.write_table(merged, "postings", partition_by=["bucket"])
        rec = store.log_metrics("merge", sec=round(time.time() - t0, 3))
        return rec

    # ---------------------------------------------------------- streaming

    def stream_batch_applied(self, checkpoint_id: str, batch_id: int) -> bool:
        """True when this (checkpoint, batch) pair has already been
        committed to the manifest — i.e. a foreachBatch replay after a
        crash between the manifest commit and the streaming-checkpoint
        commit. A different checkpoint id is a different stream and never
        matches (its batch numbering restarts)."""
        st = self.store.manifest()["stages"].get("stream")
        return (
            bool(st)
            and st.get("fingerprint") == str(checkpoint_id)
            and int(batch_id) <= int(st.get("last_batch_id", -1))
        )

    def make_stream_processor(self, checkpoint_dir: str):
        """The foreachBatch sink body, exposed so tests can replay a batch
        id and observe the idempotent skip."""
        ckpt = os.path.abspath(checkpoint_dir)

        def process(batch_df: DataFrame, batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            if self.stream_batch_applied(ckpt, batch_id):
                return  # replay of a batch whose append already committed
            self.append_increment(batch_df, stream_batch=(ckpt, int(batch_id)))

        return process

    def stream_from_directory(
        self, input_dir: str, checkpoint_dir: str, trigger_once: bool = True
    ):
        """Structured Streaming file-source ingest: new corpus parquet files
        landing in ``input_dir`` are appended to the index exactly once.
        The streaming checkpoint tracks consumed files (at-least-once);
        recording the applied batch_id inside append_increment's atomic
        manifest swap and skipping already-applied ids on replay closes the
        crash window between the two commits, making the sink idempotent
        per batch and the pipeline exactly-once end-to-end."""
        stream = (
            self.spark.readStream.schema(CORPUS_SCHEMA)
            .parquet(input_dir)
        )
        writer = (
            stream.writeStream.foreachBatch(
                self.make_stream_processor(checkpoint_dir)
            )
            .option("checkpointLocation", checkpoint_dir)
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
