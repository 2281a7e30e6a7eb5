"""Large-corpus end-to-end build bench (VERDICT r3 #8).

Builds the full index over a >=5M-doc synthetic code corpus — ~8x the
600k scaling corpus — recording per-stage seconds (from the engine's own
metrics.jsonl lineage), docs/sec, and peak RSS of both the Python driver
and the Spark JVM, to evidence salting + memory headroom beyond the
scaling corpus. A few warm queries at the end show the lookup path at
this vocabulary/postings size.

Usage: python tools/bench_bigcorpus.py [n_docs]   (default 5_000_000)
Prints one JSON line. Run on an idle host (BENCH/NOISE_r03.md rules);
uses /dev/shm to keep disk writeback noise out of the measurement.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
QUERIES = [
    (["import", "return"], "or", 10),
    (["def", "class", "self"], "and", 10),
    (["import", "sym0100", "uniq42"], "or", 10),
]


def _peak_rss_mb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmHWM"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def _java_pids() -> list[int]:
    out = []
    for p in glob.glob("/proc/[0-9]*/comm"):
        try:
            with open(p) as f:
                if f.read().strip() == "java":
                    out.append(int(p.split("/")[2]))
        except OSError:
            continue
    return out


def main() -> None:
    from excelastic_spark.build import IndexBuilder
    from excelastic_spark.catalog import IndexStore
    from excelastic_spark.config import EngineConfig
    from excelastic_spark.corpus import synthesize_corpus
    from excelastic_spark.query import QueryEngine
    from excelastic_spark.session import get_spark

    cfg = EngineConfig(
        n_buckets=32, block_size=128, salt_threshold=4000, salt_target=2000,
        shuffle_partitions=64,
    )
    spark = get_spark(app_name="bench-bigcorpus", master="local[32]", config=cfg)
    spark.sparkContext.setLogLevel("ERROR")
    root = "/dev/shm/excelastic_big"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)

    # corpus materialized to parquet first (untimed): the timed build reads
    # from storage like a real Iceberg-table ingest
    corpus_path = f"{root}/corpus"
    t0 = time.time()
    synthesize_corpus(spark, N_DOCS, partitions=256).write.parquet(corpus_path)
    synth_sec = time.time() - t0
    corpus = spark.read.parquet(corpus_path)

    store = IndexStore(root, "big_idx")
    t0 = time.time()
    IndexBuilder(spark, store, cfg).build(corpus)
    build_sec = time.time() - t0

    stage_sec: dict[str, float] = {}
    with open(store.metrics_path) as f:
        for line in f:
            rec = json.loads(line)
            if "sec" in rec:
                stage_sec[rec["stage"]] = rec["sec"]

    qe = QueryEngine(spark, store, cfg)
    for terms, mode, k in QUERIES:  # warm (OS page cache + arrow datasets)
        qe.search(terms, mode=mode, k=k)
    lat, lat_cached = [], []
    lookup_sec, score_sec = [], []
    for terms, mode, k in QUERIES:
        # cold = decoded-postings LRU disabled (r5): the honest O(df)
        # fetch+decode+score cost a first-touch query pays
        cold_engine = QueryEngine(spark, store, cfg, cache_mb=0.0)
        times = []
        for _ in range(5):
            t0 = time.time()
            res = cold_engine.search(terms, mode=mode, k=k)
            times.append(time.time() - t0)
        lat.append(statistics.median(times))
        lookup_sec.append(res.lookup_sec)
        score_sec.append(res.score_sec)
        # cached = repeat on the warm shared engine (LRU hit: no fetch,
        # no decode — the steady-state hot-term cost)
        times = []
        for _ in range(5):
            t0 = time.time()
            qe.search(terms, mode=mode, k=k)
            times.append(time.time() - t0)
        lat_cached.append(statistics.median(times))
    # distributed path on the hottest query: the cluster alternative for
    # monster-df queries where even a fused driver decode is O(df)
    terms, mode, k = QUERIES[0]
    qe.search_distributed(terms, mode, k).collect()  # warm
    dist_times = []
    for _ in range(3):
        t0 = time.time()
        qe.search_distributed(terms, mode, k).collect()
        dist_times.append(time.time() - t0)

    # head tier: bounded-latency approximate path for the same hot queries
    from excelastic_spark.heads import build_heads

    t0 = time.time()
    build_heads(spark, store, head_size=4096)
    heads_build_sec = time.time() - t0
    qe2 = QueryEngine(spark, store, cfg)
    head_lat, head_recall, head_exact, head_gap = [], [], [], []
    head_modes = []
    for terms, mode, k in QUERIES:
        # r5: the head tier serves BOTH modes (AND candidates are exact-
        # score docs present in every term's head; OR is lower-bounded)
        exact_ids = set(
            int(d) for d in qe.search(terms, mode=mode, k=k).doc_ids
        )
        qe2.search_head(terms, k=k, mode=mode)  # warm
        times = []
        for _ in range(5):
            t0 = time.time()
            res = qe2.search_head(terms, k=k, mode=mode)
            times.append(time.time() - t0)
        head_modes.append(mode)
        head_lat.append(round(1e3 * statistics.median(times), 2))
        got = set(int(d) for d in res.doc_ids)
        head_recall.append(
            round(len(got & exact_ids) / max(len(exact_ids), 1), 3)
        )
        head_exact.append(bool(res.set_exact))
        head_gap.append(
            float(res.score_gap.max()) if res.score_gap.size else 0.0
        )
    # bounded tier on the hottest AND query: certificate-gated fast path
    # with honest fallback timing when the certificate refuses
    and_terms, _, and_k = QUERIES[1]
    qe2.search_bounded(and_terms, "and", and_k)  # warm
    times = []
    for _ in range(3):
        t0 = time.time()
        bres = qe2.search_bounded(and_terms, "and", and_k)
        times.append(time.time() - t0)
    bounded_and = {
        "p50_ms": round(1e3 * statistics.median(times), 1),
        "served_by": "head" if bres.approximate else "exact_fallback",
    }

    # incremental head refresh at scale (r5): append ~1% then refresh —
    # must cost O(increment), not the O(index) of the full build above
    from pyspark.sql import functions as F

    from excelastic_spark.heads import refresh_heads
    from excelastic_spark.streaming.incremental import IncrementalIndexer

    inc_docs = max(10_000, N_DOCS // 100)
    inc_corpus = synthesize_corpus(
        spark, inc_docs, partitions=8, seed=123
    ).withColumn("path", F.concat(F.lit("inc/"), F.col("path")))
    t0 = time.time()
    IncrementalIndexer(spark, store, cfg).append_increment(inc_corpus)
    append_sec = time.time() - t0
    t0 = time.time()
    new_heads = refresh_heads(spark, store)
    heads_refresh_sec = time.time() - t0
    assert len(new_heads) == 1, new_heads  # only the appended segment
    qe3 = QueryEngine(spark, store, cfg)
    t0 = time.time()
    qe3.search_head(QUERIES[0][0], k=10)  # serves without a full rebuild
    head_after_refresh_ms = round(1e3 * (time.time() - t0), 2)

    idx_bytes = sum(
        os.path.getsize(os.path.join(dp, fn))
        for dp, _, fns in os.walk(os.path.join(root, "big_idx"))
        for fn in fns
    )
    out = {
        "metric": "bigcorpus_build_docs_per_sec",
        "value": round(N_DOCS / build_sec, 1),
        "unit": "docs/sec",
        "n_docs": N_DOCS,
        "synthesize_sec": round(synth_sec, 1),
        "build_sec": round(build_sec, 1),
        "stage_sec": stage_sec,
        "query_p50_ms": [round(1e3 * t, 2) for t in lat],
        "query_p50_ms_lru_cached": [round(1e3 * t, 2) for t in lat_cached],
        "query_lookup_sec": [round(t, 3) for t in lookup_sec],
        "query_score_sec": [round(t, 3) for t in score_sec],
        "distributed_hot_query_p50_ms": round(
            1e3 * statistics.median(dist_times), 1
        ),
        "heads_build_sec": round(heads_build_sec, 1),
        "head_query_modes": head_modes,
        "head_query_p50_ms": head_lat,
        "bounded_and_hot": bounded_and,
        "append_docs": inc_docs,
        "append_sec": round(append_sec, 1),
        "heads_refresh_sec": round(heads_refresh_sec, 1),
        "head_query_after_refresh_ms": head_after_refresh_ms,
        "head_recall_at_k": head_recall,
        "head_set_exact": head_exact,
        "head_max_score_gap": head_gap,
        "index_bytes": idx_bytes,
        "peak_rss_driver_mb": round(_peak_rss_mb(os.getpid()), 1),
        "peak_rss_jvm_mb": round(
            max((_peak_rss_mb(p) for p in _java_pids()), default=0.0), 1
        ),
    }
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
