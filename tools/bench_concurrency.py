"""Concurrent-query latency bench for the search-head path (VERDICT r3 #5).

A real head node serves many tenants at once; the single-stream p50 in
bench.py says nothing about behavior under concurrency. This bench drives
one warm QueryEngine (the pyarrow bucket-pruned driver lookup — no Spark
job per query) from T threads at several concurrency levels and reports
per-level p50/p99 latency and aggregate QPS.

Why threads are the right model: the per-query hot path is pyarrow
dataset scans + numpy decode/score, both of which release the GIL, so OS
threads give genuine parallelism on the head node — the same shape as a
threaded HTTP front-end (web.py's ThreadingHTTPServer).

Usage: python tools/bench_concurrency.py [sf_dir] [levels] [queries_per_level]
  defaults: /root/testdata/sf0.1  1,8,32  480

Prints one JSON line; run on an otherwise-idle host (BENCH/NOISE_r03.md).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
LEVELS = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "1,8,32").split(",")]
QUERIES_PER_LEVEL = int(sys.argv[3]) if len(sys.argv) > 3 else 480

QUERY_SET = [
    (["table", "query"], "or", 10),
    (["scan", "value", "stream"], "or", 10),
    (["table", "query"], "and", 10),
    (["customer", "window", "sort"], "and", 10),
    (["table", "zzznotaterm"], "or", 10),
    (["hash", "join", "merge"], "or", 100),
]


def run_level(searcher, n_threads: int, total: int) -> dict:
    """``searcher``: anything with .search(terms, mode=..., k=...) —
    the raw QueryEngine (unbounded: every client thread runs its own
    query) or a QueryExecutor (bounded pool + queue)."""
    qe = searcher
    work = [QUERY_SET[i % len(QUERY_SET)] for i in range(total)]
    lat: list[float] = []
    lock = threading.Lock()
    idx = {"i": 0}
    start = threading.Barrier(n_threads + 1)

    def worker() -> None:
        start.wait()
        while True:
            with lock:
                i = idx["i"]
                if i >= len(work):
                    return
                idx["i"] = i + 1
            terms, mode, k = work[i]
            t0 = time.perf_counter()
            qe.search(terms, mode=mode, k=k)
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)

    threads = [threading.Thread(target=worker) for _ in range(n_threads)]
    for t in threads:
        t.start()
    start.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat.sort()
    return {
        "threads": n_threads,
        "queries": len(lat),
        "wall_sec": round(wall, 3),
        "qps": round(len(lat) / wall, 1),
        "p50_ms": round(1e3 * lat[len(lat) // 2], 2),
        "p99_ms": round(1e3 * lat[int(len(lat) * 0.99) - 1], 2),
        "max_ms": round(1e3 * lat[-1], 2),
    }


def main() -> None:
    from excelastic_spark.build import IndexBuilder
    from excelastic_spark.catalog import IndexStore
    from excelastic_spark.config import EngineConfig
    from excelastic_spark.corpus import documents_as_corpus
    from excelastic_spark.query import QueryEngine
    from excelastic_spark.session import get_spark

    cfg = EngineConfig(
        n_buckets=16, block_size=128, salt_threshold=2000, salt_target=1000,
        shuffle_partitions=32, files_max_partition_bytes=2 * 1024 * 1024,
        advisory_partition_bytes=4 * 1024 * 1024,
    )
    spark = get_spark(app_name="bench-concurrency", master="local[32]", config=cfg)
    spark.sparkContext.setLogLevel("ERROR")
    wh = "/dev/shm/excelastic_conc_wh"
    shutil.rmtree(wh, ignore_errors=True)
    store = IndexStore(wh, "docs_idx")
    IndexBuilder(spark, store, cfg).build(
        documents_as_corpus(spark, SF_DIR), pre_ingested=True
    )
    qe = QueryEngine(spark, store, cfg)
    for terms, mode, k in QUERY_SET:  # warm: bucket cache + arrow dataset
        qe.search(terms, mode=mode, k=k)
        qe.search(terms, mode=mode, k=k)

    from excelastic_spark.query import QueryExecutor

    # interleaved: (direct, bounded) at each client level so both paths
    # sample the same host-noise windows (BENCH/NOISE_r03.md)
    direct, bounded = [], []
    with QueryExecutor(qe, workers=2) as qx:
        for n in LEVELS:
            direct.append(run_level(qe, n, QUERIES_PER_LEVEL))
            bounded.append(run_level(qx, n, QUERIES_PER_LEVEL))
    base = next(lv for lv in bounded if lv["threads"] == min(LEVELS))
    out = {
        "metric": "concurrent_query_p50_ms",
        "value": bounded[-1]["p50_ms"],
        "unit": "ms",
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "queries_per_level": QUERIES_PER_LEVEL,
        "direct_levels": direct,
        "bounded_levels": bounded,
        "bounded_workers": 2,
        "bounded_qps_max_vs_1": round(bounded[-1]["qps"] / base["qps"], 2),
    }
    spark.stop()
    shutil.rmtree(wh, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
