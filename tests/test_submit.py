"""spark-submit --py-files smoke test (the north rule's invocation mode).

The cluster submission story is: package the engine once
(tools/package.py -> a deterministic zip of excelastic_spark/) and run
`spark-submit --py-files engine.zip index.py ...` — the standard way a
multi-executor cluster ships driver+executor Python code. This test proves
the artifact is SELF-CONTAINED: index.py is copied to a bare staging dir
(no excelastic_spark/ package next to it, PYTHONPATH stripped), so every
`import excelastic_spark...` in the child can only resolve from the
--py-files zip; a missing module in the zip fails here, not on a cluster.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    for p in ("/opt/spark/bin/spark-submit",):
        if os.path.exists(p):
            return p
    return None


def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("no spark-submit on PATH")
    from excelastic_spark.corpus import synthesize_corpus

    corpus = str(tmp_path / "corpus")
    synthesize_corpus(spark, 120, partitions=2).write.parquet(corpus)

    # deterministic artifact (tools/package.py)
    zip_path = str(tmp_path / "engine.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py"), zip_path],
        check=True, capture_output=True, cwd=REPO,
    )
    # bare staging dir: ONLY the app script; imports must come from the zip
    stage = tmp_path / "stage"
    stage.mkdir()
    shutil.copy(os.path.join(REPO, "index.py"), stage / "index.py")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    wh = str(tmp_path / "wh")

    def run(*args: str) -> str:
        proc = subprocess.run(
            [submit, "--master", "local[2]", "--py-files", zip_path,
             "index.py", "--warehouse", wh, "--name", "sub",
             "--master", "local[2]", *args],
            cwd=stage, env=env, capture_output=True, text=True, timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        return proc.stdout.strip().splitlines()[-1]

    build = json.loads(run("build", "--corpus", corpus,
                           "--salt-threshold", "16", "--block-size", "8"))
    assert build["ingest"]["n_docs"] == 120
    results = json.loads(run("query", "--terms", "import,return",
                             "--mode", "or", "--k", "3"))
    assert len(results) == 3 and results[0]["score"] > 0.0
    # the submitted build must be bit-identical to an in-process build of
    # the same corpus (same layout params) — scores AND doc ids
    from excelastic_spark.build import IndexBuilder
    from excelastic_spark.catalog import IndexStore
    from excelastic_spark.config import EngineConfig
    from excelastic_spark.query import QueryEngine

    cfg = EngineConfig(salt_threshold=16, block_size=8)
    store = IndexStore(str(tmp_path / "wh_local"), "loc")
    IndexBuilder(spark, store, cfg).build(spark.read.parquet(corpus))
    res = QueryEngine(spark, store, cfg).search(
        ["import", "return"], mode="or", k=3
    )
    assert [r["doc_id"] for r in results] == [int(d) for d in res.doc_ids]
    assert [r["score"] for r in results] == [float(s) for s in res.scores]
