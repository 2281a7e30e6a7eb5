"""Scaling-efficiency benchmark: the SAME index build at two parallelism
levels (N and 4N cores) on identical input, per the north rule's
two-cluster-size criterion (real N->4N executors is out of sandbox scope —
BASELINE.md). Each level runs in a fresh subprocess (fresh JVM); the corpus
is materialized to parquet first (untimed) so the timed build reads from
storage like a real Iceberg-table ingest. Warehouse on tmpfs so host disk
writeback noise (measured at 2x run-to-run on /tmp) stays out of the CPU
scaling signal; min-of-reps is the noise-robust estimator.

Writes BENCH/BASELINE.md with both throughputs and
efficiency = (docs_per_sec[4N] / docs_per_sec[N]) / 4.

Usage: python bench_scaling.py [n_docs] [N] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

WORKER = r"""
import json, shutil, sys, time
sys.path.insert(0, ".")
from excelastic_spark.build import IndexBuilder
from excelastic_spark.catalog import IndexStore
from excelastic_spark.config import EngineConfig
from excelastic_spark.corpus import synthesize_corpus
from excelastic_spark.query import QueryEngine
from excelastic_spark.session import get_spark

cpus, n_docs = int(sys.argv[1]), int(sys.argv[2])
cfg = EngineConfig(
    n_buckets=16, block_size=128, salt_threshold=20000, salt_target=10000,
    shuffle_partitions=cpus * 2,
    files_max_partition_bytes=2 * 1024 * 1024,
    advisory_partition_bytes=4 * 1024 * 1024,
)
spark = get_spark(app_name=f"scale-{cpus}", master=f"local[{cpus}]", config=cfg)
spark.sparkContext.setLogLevel("ERROR")
wh = f"/dev/shm/excelastic_scale_{cpus}"
shutil.rmtree(wh, ignore_errors=True)
store = IndexStore(wh, "idx")
corpus_path = f"{wh}/corpus"
synthesize_corpus(spark, n_docs, partitions=64).write.mode("overwrite").parquet(corpus_path)
corpus = spark.read.parquet(corpus_path)
t0 = time.time()
m = IndexBuilder(spark, store, cfg).build(corpus)
build_sec = time.time() - t0
qe = QueryEngine(spark, store, cfg)
t0 = time.time()
reps = 10
for _ in range(reps):
    qe.search(["import", "return"], "or", 10)
    qe.search(["def", "class", "self"], "and", 10)
q_sec = (time.time() - t0) / (2 * reps)
stages = {k: v.get("sec") for k, v in m.items() if isinstance(v, dict) and "sec" in v}
print(json.dumps({
    "cpus": cpus, "n_docs": n_docs, "build_sec": round(build_sec, 2),
    "docs_per_sec": round(n_docs / build_sec, 1),
    "query_mean_sec": round(q_sec, 4), "stages": stages,
}))
shutil.rmtree(wh, ignore_errors=True)
spark.stop()
"""


def run(cpus: int, n_docs: int) -> dict:
    # Pin the whole process tree (JVM + Python workers) to exactly `cpus`
    # hardware cores. Without pinning, local[N] understates scaling
    # efficiency dishonestly in N's favor: the N-level JVM's GC, shuffle,
    # netty and parquet-writer threads spill onto the host's idle cores,
    # inflating the small level's throughput — a real N-executor cluster
    # has N cores TOTAL per executor for task + GC + IO work alike.
    cmd = [sys.executable, "-c", WORKER, str(cpus), str(n_docs)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd,
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)), timeout=3000,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"worker failed:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def best_of(cpus: int, n_docs: int, reps: int) -> dict:
    results = [run(cpus, n_docs) for _ in range(reps)]
    return min(results, key=lambda r: r["build_sec"])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    rn = best_of(n, n_docs, reps)
    r4n = best_of(4 * n, n_docs, reps)
    eff = (r4n["docs_per_sec"] / rn["docs_per_sec"]) / 4.0
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH/BASELINE — scaling efficiency (N vs 4N parallelism)\n\n"
            "Same deterministic synthetic corpus (Zipf-skewed code-like "
            "text), corpus pre-materialized to parquet, fresh JVM per level, "
            f"min of {reps} reps per level (the sandbox host shows ~2x "
            "run-to-run noise; warehouse on tmpfs). Each level is pinned "
            "with `taskset` to exactly its core count, so the N-level JVM "
            "cannot spill GC/shuffle/IO threads onto idle host cores (a "
            "real N-executor cluster has N cores total). Evidences the "
            "north rule's N->4N executor criterion at local[N] vs "
            "local[4N] per BASELINE.md.\n\n"
            f"| parallelism | docs | build sec | docs/sec | query mean sec |\n"
            f"|---|---|---|---|---|\n"
            f"| local[{n}] (N) | {rn['n_docs']} | {rn['build_sec']} | {rn['docs_per_sec']} | {rn['query_mean_sec']} |\n"
            f"| local[{4*n}] (4N) | {r4n['n_docs']} | {r4n['build_sec']} | {r4n['docs_per_sec']} | {r4n['query_mean_sec']} |\n\n"
            f"**Scaling efficiency = (docs_per_sec[{4*n}] / docs_per_sec[{n}]) / 4 "
            f"= {eff:.3f}** (target >= 0.8)\n\n"
            f"Per-stage seconds at N: {json.dumps(rn['stages'])}\n\n"
            f"Per-stage seconds at 4N: {json.dumps(r4n['stages'])}\n\n"
            "Note: local[N] threads share one JVM, one Python-worker pool and "
            "one memory bus, so this is a conservative proxy for independent "
            "executors; the dominant build stages (tokenize, postings encode) "
            "are shuffle-partitioned map work that scales with executors on a "
            "real cluster.\n"
        )
    print(json.dumps({"rN": rn, "r4N": r4n, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
