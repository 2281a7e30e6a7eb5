"""Index storage seam: parquet tables + JSON snapshot manifest.

The north rule asks for Iceberg tables; no Iceberg runtime jar is available
offline in this sandbox (SURVEY.md §7), so this module is a thin catalog seam
with Iceberg-equivalent semantics at the call sites:

* bucket partitioning on ``bucket = pmod(xxhash64(term), n_buckets)`` — the
  parquet-directory analog of Iceberg's ``bucket(N, term)`` partition
  transform, giving partition pruning on term lookups;
* atomic snapshot commits — a table write lands in a ``snap-<id>`` directory
  and the manifest is swapped via atomic rename, so readers never see a
  half-written index (the property the reference gets from its
  validate-then-write two-phase design, ExcelParser.java:90-102 +
  README.md:15, and that Iceberg gets from metadata swaps);
* per-stage lineage entries (fingerprint of the input snapshot) so a build
  is checkpoint-resumable: a re-run skips stages whose committed fingerprint
  matches (north rule: "resumable from checkpoint with per-partition
  lineage").

Swapping in real Iceberg is a config change: replace ``write_table`` /
``read_table`` bodies with ``writeTo(...).createOrReplace()`` / catalog reads.
"""

from __future__ import annotations

import contextlib
import json
import os
import threading
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

try:
    import fcntl
except ImportError:  # non-POSIX fallback: thread lock only
    fcntl = None


class IndexStore:
    """One named index inside a warehouse directory."""

    def __init__(self, warehouse: str, name: str):
        self.root = os.path.join(warehouse, name)
        os.makedirs(self.root, exist_ok=True)
        self.manifest_path = os.path.join(self.root, "manifest.json")
        self.metrics_path = os.path.join(self.root, "metrics.jsonl")
        # serializes manifest read-modify-write across concurrent stage
        # threads (the docs/terms stages commit in parallel); the file lock
        # below extends this across PROCESSES (concurrent shard writers —
        # the optimistic-commit role Iceberg's metastore plays)
        self._mlock = threading.Lock()
        self._lock_path = os.path.join(self.root, ".manifest.lock")
        self._writer_tlock = threading.Lock()
        self._writer_lock_path = os.path.join(self.root, ".writer.lock")

    @contextlib.contextmanager
    def writer_lock(self):
        """Exclusive cross-process WRITER section for read-compute-commit
        operations whose correctness depends on the manifest not changing
        between their initial read and their final commit — append
        (doc_id assignment from running totals) and merge (read-then-
        overwrite of the postings path list). The commit lock below only
        makes the final swap atomic; two appends could both read
        max_doc_id=M and assign colliding ids, and a merge could drop a
        segment appended mid-merge, without this outer serialization.
        Separate lock file so commit_snapshot/commit_stage can be called
        while held. Concurrent SHARD builds do NOT take it: their doc_ids
        are pre-assigned by the plan (disjoint by construction) and their
        commits are pure segment appends."""
        with self._writer_tlock:
            if fcntl is None:
                yield
                return
            with open(self._writer_lock_path, "a") as lf:
                fcntl.flock(lf, fcntl.LOCK_EX)
                try:
                    yield
                finally:
                    fcntl.flock(lf, fcntl.LOCK_UN)

    @contextlib.contextmanager
    def _commit_lock(self):
        """thread lock + advisory file lock: manifest read-modify-write is
        atomic across threads AND across independent writer processes
        (parallel shard builds append segments to one index)."""
        with self._mlock:
            if fcntl is None:
                yield
                return
            with open(self._lock_path, "a") as lf:
                fcntl.flock(lf, fcntl.LOCK_EX)
                try:
                    yield
                finally:
                    fcntl.flock(lf, fcntl.LOCK_UN)

    # ------------------------------------------------------------ manifest

    def manifest(self) -> dict[str, Any]:
        if not os.path.exists(self.manifest_path):
            return {"tables": {}, "stages": {}, "snapshots": []}
        with open(self.manifest_path) as f:
            return json.load(f)

    def _commit_manifest(self, m: dict[str, Any]) -> None:
        tmp = self.manifest_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
        os.replace(tmp, self.manifest_path)  # atomic snapshot swap

    # -------------------------------------------------------------- tables

    def table_path(self, table: str) -> str:
        loc = self.manifest()["tables"].get(table)
        if loc is None:
            raise KeyError(f"table {table!r} not committed in {self.root}")
        return loc

    def has_table(self, table: str) -> bool:
        return table in self.manifest()["tables"]

    def stage_table(
        self,
        df: DataFrame,
        table: str,
        partition_by: list[str] | None = None,
    ) -> str:
        """Write a snapshot dir WITHOUT committing it to the manifest.
        Until :meth:`commit_snapshot` publishes the path, readers cannot see
        it and a crash leaves the index exactly as before (the staged dir is
        an orphan, removable by :meth:`vacuum`)."""
        snap = f"snap-{uuid.uuid4().hex[:12]}"
        path = os.path.join(self.root, table, snap)
        w = df.write.mode("errorifexists")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        return path

    def commit_snapshot(
        self,
        writes: list[tuple[str, str, str]],
        stages: dict[str, dict[str, Any]] | None = None,
        config: dict[str, Any] | None = None,
    ) -> None:
        """Publish staged table writes + stage entries in ONE atomic
        manifest swap — the Iceberg multi-table-transaction analog. A
        multi-table operation (append: new docs/triples/postings segments +
        replaced terms/stats + advanced running totals) either becomes
        visible in full or not at all; there is no window where collection
        stats count docs whose postings never landed.

        ``writes``: ``(table, staged_path, mode)`` with mode ``'overwrite'``
        (Iceberg createOrReplace) or ``'append'`` (adds a snapshot dir that
        readers union — segment-append, SURVEY.md §2B B3)."""
        with self._commit_lock():
            m = self.manifest()
            for table, path, mode in writes:
                if mode == "append" and table in m["tables"]:
                    existing = m["tables"][table]
                    paths = (
                        existing if isinstance(existing, list) else [existing]
                    )
                    m["tables"][table] = paths + [path]
                else:
                    m["tables"][table] = path
                m["snapshots"].append(
                    {"table": table, "path": path, "ts": time.time(),
                     "mode": mode}
                )
            for stage, entry in (stages or {}).items():
                m["stages"][stage] = {"ts": time.time(), **entry}
            if config is not None:
                # layout persisted atomically WITH the tables it describes
                # (an increment creating a fresh index must not publish data
                # whose layout params a later session cannot recover)
                m["config"] = config
            self._commit_manifest(m)

    def write_table(
        self,
        df: DataFrame,
        table: str,
        partition_by: list[str] | None = None,
        mode: str = "overwrite",
    ) -> str:
        """Write to a fresh snapshot dir, then commit by manifest swap —
        stage + single-table commit_snapshot."""
        path = self.stage_table(df, table, partition_by)
        self.commit_snapshot([(table, path, mode)])
        return path

    def vacuum(self, grace_sec: float = 3600.0) -> list[str]:
        """Remove snapshot dirs not referenced by the manifest (orphans from
        crashed multi-table transactions). Returns the removed paths.

        ``grace_sec``: unreferenced dirs whose mtime is younger than this
        are skipped — staging is unregistered (only the manifest swap is
        locked), so a concurrent append in another thread/process may have
        dirs staged-but-not-yet-published; deleting those would leave the
        append's freshly committed manifest pointing at missing paths. An
        in-flight stage is minutes old at most; a crash orphan survives one
        grace window and is reclaimed by the next vacuum. Pass 0 only when
        no concurrent writers can exist (tests, offline maintenance)."""
        import shutil

        m = self.manifest()
        live: set[str] = set()
        for loc in m["tables"].values():
            live.update(loc if isinstance(loc, list) else [loc])
        now = time.time()
        removed = []
        for table in os.listdir(self.root):
            tdir = os.path.join(self.root, table)
            if not os.path.isdir(tdir):
                continue
            for snap in os.listdir(tdir):
                p = os.path.join(tdir, snap)
                if not snap.startswith("snap-") or p in live:
                    continue
                try:
                    age = now - os.path.getmtime(p)
                except OSError:
                    continue  # already gone (concurrent vacuum)
                if age < grace_sec:
                    continue  # possibly an in-flight stage — keep
                shutil.rmtree(p, ignore_errors=True)
                removed.append(p)
        return removed

    def read_table(self, spark: SparkSession, table: str) -> DataFrame:
        loc = self.table_path(table)
        paths = loc if isinstance(loc, list) else [loc]
        # one read per snapshot, unioned: each snapshot root does its own
        # hive partition discovery (a single multi-root read conflicts);
        # partition pruning pushes into every branch of the union
        df = spark.read.parquet(paths[0])
        for p in paths[1:]:
            df = df.unionByName(spark.read.parquet(p))
        return df

    def drop(self) -> None:
        """DELETE <index> analog (reference: ElasticWriter.java:186-194,
        the --clear flag)."""
        import shutil

        shutil.rmtree(self.root, ignore_errors=True)
        os.makedirs(self.root, exist_ok=True)

    # -------------------------------------------------------------- config

    def save_config(self, cfg_dict: dict[str, Any]) -> None:
        """Persist the engine config used at build time so append/merge/
        query sessions default to the INDEX's layout parameters (salt
        thresholds, block size, bucket count) instead of process defaults."""
        with self._commit_lock():
            m = self.manifest()
            m["config"] = cfg_dict
            self._commit_manifest(m)

    def load_config(self) -> dict[str, Any] | None:
        return self.manifest().get("config")

    # --------------------------------------------------- lineage / resume

    def stage_done(self, stage: str, fingerprint: str) -> bool:
        st = self.manifest()["stages"].get(stage)
        return bool(st) and st.get("fingerprint") == fingerprint

    def commit_stage(
        self, stage: str, fingerprint: str, **extra: Any
    ) -> None:
        with self._commit_lock():
            m = self.manifest()
            m["stages"][stage] = {
                "fingerprint": fingerprint,
                "ts": time.time(),
                **extra,
            }
            self._commit_manifest(m)

    # -------------------------------------------------------------- metrics

    def log_metrics(self, stage: str, **metrics: Any) -> dict[str, Any]:
        """Per-stage structured metrics (terms/sec, postings/sec, bytes) —
        the analog of the reference's per-batch progress events
        (ElasticWriter.java:147-156), but engine-grade."""
        rec = {"stage": stage, "ts": time.time(), **metrics}
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(rec, sort_keys=True) + "\n")
        return rec
