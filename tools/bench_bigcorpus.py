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
    for terms, mode, k in QUERIES:  # warm
        qe.search(terms, mode=mode, k=k)
    lat = []
    lookup_sec, score_sec = [], []
    for terms, mode, k in QUERIES:
        times = []
        for _ in range(5):
            t0 = time.time()
            res = qe.search(terms, mode=mode, k=k)
            times.append(time.time() - t0)
        lat.append(statistics.median(times))
        lookup_sec.append(res.lookup_sec)
        score_sec.append(res.score_sec)
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
    build_heads(spark, store, cfg, head_size=4096)
    heads_build_sec = time.time() - t0
    qe2 = QueryEngine(spark, store, cfg)
    head_lat, head_recall, head_exact, head_gap = [], [], [], []
    for terms, mode, k in QUERIES:
        if mode != "or":
            continue
        exact_ids = set(int(d) for d in qe.search(terms, mode="or", k=k).doc_ids)
        qe2.search_head(terms, k=k)  # warm
        times = []
        for _ in range(5):
            t0 = time.time()
            res = qe2.search_head(terms, k=k)
            times.append(time.time() - t0)
        head_lat.append(round(1e3 * statistics.median(times), 2))
        got = set(int(d) for d in res.doc_ids)
        head_recall.append(
            round(len(got & exact_ids) / max(len(exact_ids), 1), 3)
        )
        head_exact.append(bool(res.set_exact))
        head_gap.append(
            float(res.score_gap.max()) if res.score_gap.size else 0.0
        )

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
        "query_lookup_sec": [round(t, 3) for t in lookup_sec],
        "query_score_sec": [round(t, 3) for t in score_sec],
        "distributed_hot_query_p50_ms": round(
            1e3 * statistics.median(dist_times), 1
        ),
        "heads_build_sec": round(heads_build_sec, 1),
        "head_query_p50_ms": head_lat,
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
