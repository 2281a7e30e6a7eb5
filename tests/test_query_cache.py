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


def test_engine_on_unbuilt_index_raises_clear_error(spark, tmp_path):
    """Constructing a QueryEngine before any build must fail with the
    clear "table 'stats' not committed" KeyError at construction — not a
    deferred AttributeError from n_docs never being set (the missing
    manifest's None version must not compare equal to the unset sentinel)."""
    store = IndexStore(str(tmp_path / "wh_empty"), "never_built")
    with pytest.raises(KeyError, match="stats"):
        QueryEngine(spark, store, EngineConfig().tiny())


def test_concurrent_memo_build_charges_once(built):
    """Two workers racing _sorted_postings on the same cold cached term:
    exactly one memo survives and the LRU budget is charged exactly once
    (a double charge would permanently shrink effective cache capacity)."""
    import threading

    spark, store, cfg = built
    qe = QueryEngine(spark, store, cfg)
    terms = ["import", "return"]
    raws = qe._lookup_raw(sorted(terms))  # seed the cache, no memos yet
    before = qe._cache_bytes
    barrier = threading.Barrier(2)
    tps: list = [None, None]

    def build(i: int) -> None:
        barrier.wait()
        tps[i] = [qe._sorted_postings(r) for r in raws.values()]

    workers = [threading.Thread(target=build, args=(i,)) for i in range(2)]
    for w in workers:
        w.start()
    for w in workers:
        w.join()
    # both workers hold the SAME TermPostings objects (one winner)
    for a, b in zip(tps[0], tps[1]):
        assert a is b
    expected_extra = sum(
        int(tp.doc_ids.nbytes + tp.weights.nbytes
            + tp.block_last.nbytes + tp.block_ub.nbytes)
        for tp in tps[0]
    )
    assert qe._cache_bytes == before + expected_extra


def test_lookup_retries_when_manifest_swaps_mid_fetch(built):
    """A manifest commit landing between a lookup's fetch and its cache
    seed must cause a RETRY against the new version — not a returned
    result mixing one snapshot's postings with another's stats, and not a
    poisoned cache."""
    spark, store, cfg = built
    qe = QueryEngine(spark, store, cfg)
    fetches = []
    orig = qe._fetch_posting_rows

    def hooked(terms):
        rows = orig(terms)
        if not fetches:
            # bump the manifest (any commit: here a config rewrite) AFTER
            # the fetch but BEFORE the seed — the classic torn window
            store.save_config(dict(store.load_config() or {"x": 1}))
        fetches.append(list(terms))
        return rows

    qe._fetch_posting_rows = hooked
    res = qe.search(["import", "return"], mode="or", k=10)
    assert len(fetches) == 2  # first lookup discarded, second succeeded
    fresh = QueryEngine(spark, store, cfg).search(
        ["import", "return"], mode="or", k=10
    )
    assert np.array_equal(res.doc_ids, fresh.doc_ids)
    assert np.array_equal(res.scores, fresh.scores)
