"""Head-tier tests (heads.py + QueryEngine.search_head).

Contract under test (heads.py module docstring):
* full-coverage heads (head_size >= every df) serve BIT-identical results
  to the exact path, certified set_exact with zero caps;
* truncated heads return scores that LOWER-bound the true scores, with
  per-result gaps that upper-bound the error (validated doc-by-doc
  against the exact engine);
* a set_exact=True certificate implies the returned set equals the exact
  top-k set;
* appends invalidate the tier (staleness refusal) until rebuilt.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from excelastic_spark.build import IndexBuilder
from excelastic_spark.catalog import IndexStore
from excelastic_spark.config import EngineConfig
from excelastic_spark.corpus import synthesize_corpus
from excelastic_spark.heads import build_heads
from excelastic_spark.query import QueryEngine

N_DOCS = 300
QUERIES = [
    ["import", "return"],
    ["def", "class", "self"],
    ["import", "sym0100"],
    ["zzznotaterm"],
    ["return"],
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh_heads"))
    cfg = EngineConfig().tiny().with_overrides(shuffle_partitions=8)
    store = IndexStore(wh, "heads_idx")
    IndexBuilder(spark, store, cfg).build(
        synthesize_corpus(spark, N_DOCS, partitions=4)
    )
    return spark, store, cfg


def _exact_scores(qe: QueryEngine, terms: list[str]) -> dict[int, float]:
    res = qe.search(terms, "or", N_DOCS + 1)
    return {int(d): float(s) for d, s in zip(res.doc_ids, res.scores)}


def test_full_coverage_is_exact_and_certified(built):
    spark, store, cfg = built
    build_heads(spark, store, head_size=10**6)
    qe = QueryEngine(spark, store, cfg)
    for terms in QUERIES:
        h = qe.search_head(terms, k=10)
        e = qe.search(terms, "or", k=10)
        assert np.array_equal(h.doc_ids, e.doc_ids), terms
        assert np.array_equal(h.scores, e.scores), terms  # bit-identical
        assert h.approximate and h.set_exact is True
        assert all(c == 0.0 for c in (h.caps or {}).values())
        assert h.score_gap is not None and not h.score_gap.any()


def test_truncated_bounds_and_certificate(built):
    spark, store, cfg = built
    build_heads(spark, store, head_size=16)
    qe = QueryEngine(spark, store, cfg)
    hits = total = 0
    for terms in QUERIES:
        h = qe.search_head(terms, k=10)
        exact = _exact_scores(qe, terms)
        e_top = qe.search(terms, "or", k=10)
        for doc, s, gap in zip(h.doc_ids, h.scores, h.score_gap):
            true = exact[int(doc)]
            assert s <= true + 1e-12, (terms, doc)  # computed lower-bounds
            assert true <= s + gap + 1e-9, (terms, doc)  # gap bounds error
        if h.set_exact:
            assert set(map(int, h.doc_ids)) == set(map(int, e_top.doc_ids))
        hits += len(set(map(int, h.doc_ids)) & set(map(int, e_top.doc_ids)))
        total += len(e_top.doc_ids)
    # measured quality floor on this corpus (not a guarantee — the
    # certificate is the guarantee; this catches silent recall collapse)
    assert total == 0 or hits / total >= 0.5, (hits, total)


def test_append_invalidates_then_rebuild(built):
    spark, store, cfg = built
    from excelastic_spark.streaming.incremental import IncrementalIndexer

    build_heads(spark, store, head_size=10**6)
    more = synthesize_corpus(spark, 40, partitions=1, seed=123).withColumn(
        "path", F.concat(F.lit("inc/"), F.col("path"))
    )
    IncrementalIndexer(spark, store, cfg).append_increment(more)
    qe = QueryEngine(spark, store, cfg)
    with pytest.raises(ValueError, match="stale"):
        qe.search_head(["import"], k=5)
    build_heads(spark, store, head_size=10**6)
    h = qe.search_head(["import", "return"], k=10)
    e = qe.search(["import", "return"], "or", k=10)
    assert np.array_equal(h.doc_ids, e.doc_ids)
    assert np.array_equal(h.scores, e.scores)
    assert h.set_exact is True


def test_search_head_k_zero_returns_empty(built):
    """k<=0 mirrors search(): an empty result, never an IndexError from
    scores[-1] on an empty array (truncated-tier branch)."""
    spark, store, cfg = built
    build_heads(spark, store, head_size=4)  # truncated -> total_cap > 0
    qe = QueryEngine(spark, store, cfg)
    for k in (0, -3):
        res = qe.search_head(["import", "return"], k=k)
        assert res.doc_ids.size == 0 and res.scores.size == 0
        assert res.approximate is True
