"""Decoded-postings LRU + manifest-version snapshot consistency
(VERDICT r4 next-round #7).

Contract:
* repeat lookups serve from the cache with BIT-identical results to a
  fresh engine (RawPostings are immutable; scorers never write in place);
* the cache is capacity-bounded (decoded bytes) — evictions change
  nothing but latency;
* a manifest commit (append/merge) in this or another process invalidates
  every manifest-derived cache AND refreshes stats, so a long-lived
  engine serves post-append scores identical to a freshly constructed
  engine (previously it silently pinned the construction-time snapshot).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from excelastic_spark.build import IndexBuilder
from excelastic_spark.catalog import IndexStore
from excelastic_spark.config import EngineConfig
from excelastic_spark.corpus import synthesize_corpus
from excelastic_spark.query import QueryEngine

QUERIES = [
    (["import", "return"], "or"),
    (["def", "class", "self"], "and"),
    (["import", "sym0100"], "or"),
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh_qcache"))
    cfg = EngineConfig().tiny().with_overrides(shuffle_partitions=8)
    store = IndexStore(wh, "qc_idx")
    IndexBuilder(spark, store, cfg).build(
        synthesize_corpus(spark, 250, partitions=4)
    )
    return spark, store, cfg


def test_cached_repeat_is_bit_identical(built):
    spark, store, cfg = built
    warm = QueryEngine(spark, store, cfg)
    for terms, mode in QUERIES:
        first = warm.search(terms, mode, k=10)
        second = warm.search(terms, mode, k=10)  # served from cache
        fresh = QueryEngine(spark, store, cfg).search(terms, mode, k=10)
        assert np.array_equal(first.doc_ids, second.doc_ids)
        assert np.array_equal(first.scores, second.scores)
        assert np.array_equal(first.doc_ids, fresh.doc_ids)
        assert np.array_equal(first.scores, fresh.scores)
    # the repeat actually hit the cache
    assert len(warm._raw_cache) > 0


def test_tiny_cache_evicts_but_stays_correct(built):
    spark, store, cfg = built
    qe = QueryEngine(spark, store, cfg, cache_mb=0.0001)  # ~100 bytes
    for terms, mode in QUERIES:
        a = qe.search(terms, mode, k=10)
        b = qe.search(terms, mode, k=10)
        assert np.array_equal(a.doc_ids, b.doc_ids)
        assert np.array_equal(a.scores, b.scores)
    assert qe._cache_bytes <= qe._cache_cap


def test_append_invalidates_cache_and_refreshes_stats(built):
    spark, store, cfg = built
    from excelastic_spark.streaming.incremental import IncrementalIndexer

    long_lived = QueryEngine(spark, store, cfg)
    pre = long_lived.search(["import", "return"], "or", k=10)  # warm cache
    assert len(long_lived._raw_cache) > 0

    more = synthesize_corpus(spark, 60, partitions=1, seed=321).withColumn(
        "path", F.concat(F.lit("qcinc/"), F.col("path"))
    )
    IncrementalIndexer(spark, store, cfg).append_increment(more)

    post = long_lived.search(["import", "return"], "or", k=10)
    fresh = QueryEngine(spark, store, cfg).search(
        ["import", "return"], "or", k=10
    )
    assert np.array_equal(post.doc_ids, fresh.doc_ids)
    assert np.array_equal(post.scores, fresh.scores)
    # stats moved (n_docs grew), so post-append scores differ from pre
    assert long_lived.n_docs == 310
    assert not (
        np.array_equal(pre.doc_ids, post.doc_ids)
        and np.array_equal(pre.scores, post.scores)
    )


def test_sorted_memo_reused_and_bit_identical(built):
    """_sorted_postings memoizes the salt-merged TermPostings on the
    cached RawPostings: the second sorted-path query must reuse the SAME
    object (no re-argsort) and the memo must be charged to the LRU byte
    budget; forced sorted-path results stay bit-identical to a fresh
    engine's."""
    spark, store, cfg = built
    qe = QueryEngine(spark, store, cfg)
    terms = ["def", "class", "self"]
    a = qe.search(terms, "and", k=10, algo="exhaustive")  # sorted path
    memos = {
        t: qe._raw_cache[t][0].sorted_tp
        for t in terms
        if t in qe._raw_cache
    }
    assert memos and all(tp is not None for tp in memos.values())
    bytes_after_memo = qe._cache_bytes
    b = qe.search(terms, "and", k=10, algo="exhaustive")
    for t, tp in memos.items():
        assert qe._raw_cache[t][0].sorted_tp is tp  # reused, not rebuilt
    assert qe._cache_bytes == bytes_after_memo  # charged exactly once
    fresh = QueryEngine(spark, store, cfg).search(
        terms, "and", k=10, algo="exhaustive"
    )
    assert np.array_equal(a.doc_ids, b.doc_ids)
    assert np.array_equal(a.scores, b.scores)
    assert np.array_equal(a.doc_ids, fresh.doc_ids)
    assert np.array_equal(a.scores, fresh.scores)
    # the memo participates in accounting: entries charge > raw arrays
    for t in memos:
        raw, nb = qe._raw_cache[t]
        assert nb > int(raw.doc_ids.nbytes + raw.impacts.nbytes)
