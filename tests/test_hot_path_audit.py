"""Hot-path audit (BASELINE.md): no per-row Python in build/query modules —
no row-at-a-time ``udf(``, no ``rdd`` usage, no ``collect()`` loops over
data-sized results in the build path. Static source scan, the same spirit as
the reference's interface contract 'do not read this into memory'
(FileParser.java:19-23)."""

from __future__ import annotations

import pathlib
import re

ENGINE = pathlib.Path(__file__).resolve().parent.parent / "excelastic_spark"

HOT_MODULES = [
    "build.py",
    "tokenizer.py",
    "stats.py",
    "codec.py",
    "corpus.py",
    "query.py",
    "heads.py",
    "sharded.py",
    "streaming/incremental.py",
    "functions/dedup.py",
    "functions/similarity.py",
    "functions/text.py",
]


def test_no_row_at_a_time_udf():
    for mod in HOT_MODULES:
        src = (ENGINE / mod).read_text()
        assert not re.search(r"\bF\.udf\(|\budf\(", src), mod
        assert "@udf" not in src, mod


def test_no_rdd_usage():
    for mod in HOT_MODULES:
        src = (ENGINE / mod).read_text()
        assert ".rdd" not in src, mod
        assert "sparkContext.parallelize" not in src, mod


def test_no_per_row_python_iteration_over_documents():
    """iterrows/itertuples allowed only over posting-index rows (a handful
    per query), never over document/token frames — enforced by allowlist."""
    # decode loops over (term, salt) posting-index ROWS (a handful per
    # query / per merge partition), never over documents/tokens — documented
    # in each module's kernel docstring
    allowed = {"query.py", "streaming/incremental.py", "heads.py"}
    for mod in HOT_MODULES:
        src = (ENGINE / mod).read_text()
        if mod in allowed:
            continue
        assert ".iterrows()" not in src and ".itertuples()" not in src, mod
