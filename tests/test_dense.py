"""Dense-scatter scorer tests: bit-exactness vs the sorted scorers.

The dense path (query._dense_topk) must produce byte-identical (doc_id,
score) output to exhaustive_or / _and_score for any posting lists —
including score ties at the k boundary and unsorted salt-concatenated
input order — because the engine's determinism contract (query.py module
docstring) promises rank- AND score-identical results on every path.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from excelastic_spark.codec import block_metadata
from excelastic_spark.query import RawPostings, _and_score, _dense_topk
from excelastic_spark.wand import TermPostings, exhaustive_or


def make_pair(
    term: str, ids, impacts, idf: float, shuffle_seed: int | None = None
) -> tuple[RawPostings, TermPostings]:
    """One term's postings in both shapes: a RawPostings whose arrays are
    deliberately permuted (like interleaved salted sub-lists) and the
    equivalent sorted TermPostings."""
    ids = np.asarray(ids, dtype=np.uint64)
    impacts = np.asarray(impacts, dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    sids, simp = ids[order], impacts[order]
    last, mx = block_metadata(sids, simp, 4)
    tp = TermPostings(term, sids, idf * simp, last, mx * idf)
    if shuffle_seed is not None and ids.size:
        perm = np.random.default_rng(shuffle_seed).permutation(ids.size)
        ids, impacts = ids[perm], impacts[perm]
    return RawPostings(term, ids, impacts, idf, presorted=False), tp


@st.composite
def term_lists(draw):
    n_terms = draw(st.integers(1, 5))
    out = []
    for t in range(n_terms):
        ids = sorted(
            draw(st.sets(st.integers(0, 300), min_size=1, max_size=60))
        )
        impacts = [
            draw(st.floats(0.01, 3.0, allow_nan=False, allow_infinity=False))
            for _ in ids
        ]
        idf = draw(
            st.floats(0.001, 8.0, allow_nan=False, allow_infinity=False)
        )
        out.append(make_pair(f"t{t}", ids, impacts, idf, shuffle_seed=t))
    return out


@given(term_lists(), st.integers(1, 20))
@settings(max_examples=150, deadline=None)
def test_dense_or_equals_exhaustive(pairs, k):
    raws = [r for r, _ in pairs]
    tps = [p for _, p in pairs]
    ids_d, sc_d = _dense_topk(raws, k, conjunctive=False)
    ids_e, sc_e = exhaustive_or(tps, k)
    assert np.array_equal(ids_d, ids_e)
    assert np.array_equal(sc_d, sc_e)  # bit-identical floats


@given(term_lists(), st.integers(1, 20))
@settings(max_examples=150, deadline=None)
def test_dense_and_equals_galloping(pairs, k):
    raws = [r for r, _ in pairs]
    tps = [p for _, p in pairs]
    ids_d, sc_d = _dense_topk(raws, k, conjunctive=True)
    ids_s, sc_s = _and_score(tps, k)
    assert np.array_equal(ids_d, ids_s)
    assert np.array_equal(sc_d, sc_s)


def test_dense_tie_break_doc_id_asc():
    raw, _ = make_pair("t", [4, 1, 3, 2], [5.0, 5.0, 5.0, 5.0], 1.0)
    ids, scores = _dense_topk([raw], 2, conjunctive=False)
    assert list(ids) == [1, 2]
    assert list(scores) == [5.0, 5.0]


def test_dense_k_exceeds_matches():
    raw, _ = make_pair("t", [7, 9], [1.0, 2.0], 2.0)
    ids, scores = _dense_topk([raw], 10, conjunctive=False)
    assert list(ids) == [9, 7]
    assert list(scores) == [4.0, 2.0]


def test_dense_empty_and_k0():
    raw, _ = make_pair("t", [1], [1.0], 1.0)
    for conj in (False, True):
        ids, scores = _dense_topk([raw], 0, conjunctive=conj)
        assert ids.size == 0 and scores.size == 0
        ids, scores = _dense_topk([], 5, conjunctive=conj)
        assert ids.size == 0 and scores.size == 0


def test_forced_dense_and_over_255_terms_counter_widens():
    """A FORCED dense conjunction with >255 terms must not wrap the match
    counter (uint8) and silently drop docs matching all terms."""
    n_terms = 300
    raws = []
    for t in range(n_terms):
        # doc 0 and doc 1 appear in every term; doc 2 in only one
        ids = [0, 1] + ([2] if t == 0 else [])
        imp = [1.0] * len(ids)
        raws.append(make_pair(f"t{t:03d}", ids, imp, idf=0.5)[0])
    ids, scores = _dense_topk(raws, k=10, conjunctive=True)
    assert set(int(d) for d in ids) == {0, 1}
    assert np.allclose(scores, 0.5 * n_terms)


def test_and_candidate_beyond_big_list_tail():
    """Galloping intersection clamp: a rare-term doc_id GREATER than every
    doc in the big list makes searchsorted return n; the clamped compare
    must exclude it (and include the genuine matches)."""
    _, rare = make_pair("a", [5, 900], [1.0, 1.0], 1.0)
    _, big = make_pair("b", [1, 5, 7, 11], [1.0, 1.0, 1.0, 1.0], 1.0)
    ids, scores = _and_score([rare, big], 10)
    assert list(ids) == [5]
    assert list(scores) == [2.0]
