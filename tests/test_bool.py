"""ES `bool` compound-query semantics on the segment engine.

The clause-algebra under test (search_bool) composes primitives that
are independently parity-tested elsewhere (accumulate_scores vs the
DuckDB BM25 oracle; load_segments round-trips) — so these tests check
the ALGEBRA: hit-set composition, filter-context non-scoring,
minimum_should_match gating, and declared-clause-order score sums.
"""

from __future__ import annotations

import pytest

from job_searchengine_project_spark.corpus import HEAD_TERMS, _build_vocab
from job_searchengine_project_spark.search.engine import SearchEngine

VOCAB = _build_vocab(500, 42)
T_A = HEAD_TERMS[1]  # "spark" — mid-Zipf, high df
T_B = VOCAB[30]
T_C = VOCAB[60]
T_D = VOCAB[90]


@pytest.fixture(scope="module")
def eng(spark, webpages_small, tmp_path_factory):
    from job_searchengine_project_spark.index.build import build_index

    out = str(tmp_path_factory.mktemp("idxbool"))
    build_index(spark, webpages_small, out, term_buckets=16)
    return SearchEngine(out)


def _docs(eng, term):
    return set(eng.accumulate_scores([term]))


def test_must_is_conjunctive_and_scores_sum(eng):
    a, b = eng.accumulate_scores([T_A]), eng.accumulate_scores([T_B])
    hits = eng.search_bool(must=[T_A, T_B], k=10**9, with_urls=False)
    got = {h.doc_id: h.score for h in hits}
    want = {d: a[d] + b[d] for d in set(a) & set(b)}
    assert want  # fixture terms must actually co-occur
    assert got == want


def test_filter_gates_without_scoring(eng):
    base = {
        h.doc_id: h.score
        for h in eng.search_bool(must=[T_A], k=10**9, with_urls=False)
    }
    filtered = eng.search_bool(must=[T_A], filter=[T_B], k=10**9, with_urls=False)
    fdocs = _docs(eng, T_B)
    assert {h.doc_id for h in filtered} == set(base) & fdocs
    for h in filtered:  # identical scores — filter context never scores
        assert h.score == base[h.doc_id]


def test_must_not_excludes(eng):
    excl = _docs(eng, T_B)
    hits = eng.search_bool(must=[T_A], must_not=[T_B], k=10**9, with_urls=False)
    got = {h.doc_id for h in hits}
    assert got == _docs(eng, T_A) - excl
    assert got  # non-degenerate


def test_pure_should_defaults_to_msm_1(eng):
    hits = eng.search_bool(should=[T_A, T_C], k=10**9, with_urls=False)
    assert {h.doc_id for h in hits} == _docs(eng, T_A) | _docs(eng, T_C)


def test_minimum_should_match_2(eng):
    hits = eng.search_bool(
        should=[T_A, T_C], minimum_should_match=2, k=10**9, with_urls=False
    )
    both = _docs(eng, T_A) & _docs(eng, T_C)
    assert {h.doc_id for h in hits} == both
    a, c = eng.accumulate_scores([T_A]), eng.accumulate_scores([T_C])
    for h in hits:
        assert h.score == a[h.doc_id] + c[h.doc_id]


def test_should_boosts_must_ranking(eng):
    # msm=0 (default with must present): should-matching docs score
    # strictly higher than their must-only score, others unchanged
    base = {
        h.doc_id: h.score
        for h in eng.search_bool(must=[T_A], k=10**9, with_urls=False)
    }
    boosted = eng.search_bool(must=[T_A], should=[T_D], k=10**9, with_urls=False)
    ddocs = _docs(eng, T_D)
    assert {h.doc_id for h in boosted} == set(base)  # msm=0: no gating
    for h in boosted:
        if h.doc_id in ddocs:
            assert h.score > base[h.doc_id]
        else:
            assert h.score == base[h.doc_id]


def test_empty_and_absent(eng):
    assert eng.search_bool(k=10) == []
    assert eng.search_bool(must=["zzz_not_a_term"], k=10, with_urls=False) == []
    # must_not of an absent term is a no-op
    a = eng.search_bool(must=[T_A], k=10**9, with_urls=False)
    b = eng.search_bool(
        must=[T_A], must_not=["zzz_not_a_term"], k=10**9, with_urls=False
    )
    assert [(h.doc_id, h.score) for h in a] == [(h.doc_id, h.score) for h in b]
