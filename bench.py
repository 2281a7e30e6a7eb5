"""Benchmark harness (driver contract): build + query the inverted index at
$SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS]; print ONE JSON line.

Headline metrics:
  * build_docs_per_sec  — index-build throughput over the sf documents table
  * synth_build_docs_per_sec — same over the 20k-doc deterministic synthetic
    code corpus (Zipf-skewed hot terms -> exercises salting at scale)
  * per-query p50 latency for the reference query set (seconds)

Scaling (N vs 4N parallelism) is measured by bench_scaling.py -> BENCH/.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SYNTH_DOCS = int(os.environ.get("BENCH_SYNTH_DOCS", "20000"))
QUERY_REPS = int(os.environ.get("BENCH_QUERY_REPS", "5"))

QUERY_SET = [
    ("q_or_hot2", ["table", "query"], "or", 10),
    ("q_or_hot3", ["scan", "value", "stream"], "or", 10),
    ("q_and_hot2", ["table", "query"], "and", 10),
    ("q_and_hot3", ["customer", "window", "sort"], "and", 10),
    ("q_or_mixed", ["table", "zzznotaterm"], "or", 10),
    ("q_k100", ["hash", "join", "merge"], "or", 100),
]
SYNTH_QUERY_SET = [
    ("s_or_hot", ["import", "return"], "or", 10),
    ("s_and_hot", ["def", "class", "self"], "and", 10),
    ("s_or_rare", ["import", "sym0100", "uniq42"], "or", 10),
    ("s_or_wide", ["while", "for", "if", "else"], "or", 25),
    # forced sorted scorers (r5): the >64M-doc-span regime where the
    # dense path is ineligible — adaptive galloping/merge intersection
    # and exhaustive union, with the memoized salt-merge
    ("s_and_sorted", ["def", "class", "self"], "and", 10, "exhaustive"),
    ("s_or_sorted", ["while", "for", "if", "else"], "or", 25, "exhaustive"),
]


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from excelastic_spark.build import IndexBuilder
    from excelastic_spark.catalog import IndexStore
    from excelastic_spark.config import EngineConfig
    from excelastic_spark.corpus import documents_as_corpus, synthesize_corpus
    from excelastic_spark.query import QueryEngine
    from excelastic_spark.session import get_spark

    cfg = EngineConfig(
        n_buckets=16,
        block_size=128,
        salt_threshold=2000,
        salt_target=1000,
        shuffle_partitions=int(CPUS),
        # size scan partitions to the bench SF so tasks ~ cores (the 128MB
        # default collapses a ~100MB corpus scan into ~3 tasks)
        files_max_partition_bytes=2 * 1024 * 1024,
        advisory_partition_bytes=4 * 1024 * 1024,
    )
    spark = get_spark(app_name="excelastic-bench", master=f"local[{CPUS}]", config=cfg)
    spark.sparkContext.setLogLevel("ERROR")

    wh = "/tmp/excelastic_bench_wh"
    shutil.rmtree(wh, ignore_errors=True)
    queries: dict[str, float] = {}

    # ---- build over the driver documents table ----
    store = IndexStore(wh, "docs_idx")
    corpus = documents_as_corpus(spark, SF_DIR)
    n_docs = corpus.count()
    t0 = time.time()
    IndexBuilder(spark, store, cfg).build(corpus, pre_ingested=True)
    build_sec = time.time() - t0
    queries["build_docs_table"] = round(build_sec, 3)

    # ---- build over the synthetic code corpus (salting exercised);
    # corpus is materialized to parquet first (untimed) — the timed build
    # reads from storage like a real Iceberg-table ingest ----
    synth_cfg = cfg.with_overrides(salt_threshold=4000, salt_target=2000)
    store2 = IndexStore(wh, "synth_idx")
    synth_path = f"{wh}/synth_corpus"
    synthesize_corpus(spark, SYNTH_DOCS, partitions=int(CPUS)).write.mode(
        "overwrite"
    ).parquet(synth_path)
    synth = spark.read.parquet(synth_path)
    t0 = time.time()
    IndexBuilder(spark, store2, synth_cfg).build(synth)
    synth_sec = time.time() - t0
    queries["build_synth"] = round(synth_sec, 3)

    # ---- query latency p50 ----
    qe = QueryEngine(spark, store, cfg)
    qe2 = QueryEngine(spark, store2, synth_cfg)
    lat_all = []
    for name, terms, mode, k, *rest in QUERY_SET + SYNTH_QUERY_SET:
        algo = rest[0] if rest else "auto"
        eng = qe if name.startswith("q_") else qe2
        times = []
        for _ in range(QUERY_REPS):
            t0 = time.time()
            eng.search(terms, mode=mode, k=k, algo=algo)
            times.append(time.time() - t0)
        p50 = statistics.median(times)
        queries[name] = round(p50, 4)
        lat_all.append(p50)

    # ---- head tier (bounded-latency approximate path) on the synth index;
    # recorded as extra keys, NOT in the headline total, so round-over-round
    # suite totals stay comparable ----
    from excelastic_spark.heads import build_heads

    t0 = time.time()
    build_heads(spark, store2, head_size=4096)
    heads_build_sec = time.time() - t0
    qe2h = QueryEngine(spark, store2, synth_cfg)
    qe2h.search_head(["import", "return"], k=10)  # warm
    times = []
    for _ in range(QUERY_REPS):
        t0 = time.time()
        res = qe2h.search_head(["import", "return"], k=10)
        times.append(time.time() - t0)
    exact_res = qe2.search(["import", "return"], mode="or", k=10)
    exact_ids = set(int(d) for d in exact_res.doc_ids)
    head_ids = [int(d) for d in res.doc_ids]
    head_recall = len(set(head_ids) & exact_ids) / max(len(exact_ids), 1)
    # set-recall is the wrong lens on stopword-grade terms: BM25 separates
    # docs at the ~1e-5 level there (the exact top-10 spans ~1.5e-5 on this
    # corpus), so an approximate tier can return docs 0.3% off-optimal and
    # still score recall 0.2. Report the honest quality number too: max
    # RELATIVE SCORE REGRET of the head's results vs the k-th exact score,
    # with exact scores read from a wide exact search.
    kth = float(exact_res.scores.min())
    wide = qe2.search(["import", "return"], mode="or", k=2000)
    escore = {int(d): float(s) for d, s in zip(wide.doc_ids, wide.scores)}

    def exact_score_of(doc: int) -> float:
        # a head doc outside the wide exact top-2000 has true score BELOW
        # wide_min; substituting wide_min would understate its regret
        # (optimistic). Score it exactly from the postings instead — same
        # lex-term fold order as the engine's scorers.
        import numpy as _np

        s = 0.0
        for t in sorted(_tps):
            tp = _tps[t]
            i = int(_np.searchsorted(tp.doc_ids, doc))
            if i < tp.doc_ids.size and int(tp.doc_ids[i]) == doc:
                s += float(tp.weights[i])
        return s

    _tps = qe2.lookup(["import", "return"])
    # NB dict.get would evaluate the default EAGERLY — exact_score_of is a
    # per-term postings binary search, so only run it for docs outside the
    # wide exact top-2000
    head_regret = max(
        max(0.0, kth - (escore[d] if d in escore else exact_score_of(d)))
        for d in head_ids
    ) / kth if head_ids else 0.0

    total = queries["build_docs_table"] + queries["build_synth"] + sum(lat_all)
    out = {
        "metric": "index_build_plus_query_suite_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "build_docs_per_sec": round(n_docs / build_sec, 1),
        "synth_build_docs_per_sec": round(SYNTH_DOCS / synth_sec, 1),
        "query_p50_sec": round(statistics.median(lat_all), 4),
        "heads_build_sec": round(heads_build_sec, 3),
        "head_q_p50_sec": round(statistics.median(times), 4),
        "head_recall_at_10": round(head_recall, 3),
        "head_max_regret_rel": round(head_regret, 6),
        "cpus": int(CPUS),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
