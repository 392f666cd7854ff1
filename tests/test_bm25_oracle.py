"""M2: end-to-end slice — pages -> prepared docs -> BM25 top-k oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from job_searchengine_project_spark import BM25_B, BM25_K1
from job_searchengine_project_spark.index.ids import assign_doc_ids
from job_searchengine_project_spark.index.prepare import prepare_docs
from job_searchengine_project_spark.search.bm25 import (
    bm25_topk_oracle,
    corpus_stats,
    score_py,
)


@pytest.fixture(scope="module")
def docs(webpages_small):
    d = prepare_docs(webpages_small).cache()
    d.count()
    return d


def test_doc_ids_dense_and_deterministic(spark, webpages_small):
    ids1 = assign_doc_ids(webpages_small, "url")
    n = webpages_small.count()
    got = sorted(r["doc_id"] for r in ids1.select("doc_id").collect())
    assert got == list(range(n))
    ids2 = assign_doc_ids(webpages_small.repartition(13), "url")
    m1 = {r["url"]: r["doc_id"] for r in ids1.select("url", "doc_id").collect()}
    m2 = {r["url"]: r["doc_id"] for r in ids2.select("url", "doc_id").collect()}
    assert m1 == m2


def test_prepared_docs_shape(docs):
    row = docs.first()
    assert row["doclen"] == sum(t["tf"] for t in row["terms"])
    terms = [t["term"] for t in row["terms"]]
    assert terms == sorted(terms)  # sorted distinct terms per doc
    assert len(terms) == len(set(terms))


def test_score_py_hand_computed():
    # N=10 docs, df=2, tf=3, dl=100, avgdl=80
    expected_idf = math.log(1 + (10 - 2 + 0.5) / (2 + 0.5))
    expected_tfn = 3 / (3 + BM25_K1 * (1 - BM25_B + BM25_B * 100 / 80))
    assert abs(score_py(3, 2, 100, 10, 80.0) - expected_idf * expected_tfn) < 1e-12


def test_oracle_matches_pure_python(docs):
    """Oracle top-k == an independent pure-Python BM25 over collected docs."""
    n_docs, avgdl = corpus_stats(docs)
    query = ["spark", "데이터엔지니어"]
    got = bm25_topk_oracle(docs, query, k=10, n_docs=n_docs, avgdl=avgdl).collect()

    rows = docs.select("doc_id", "doclen", "terms").collect()
    df_t = {t: 0 for t in query}
    for r in rows:
        present = {x["term"] for x in r["terms"]}
        for t in query:
            if t in present:
                df_t[t] += 1
    scores = {}
    for r in rows:
        tfs = {x["term"]: x["tf"] for x in r["terms"]}
        s = 0.0
        for t in sorted(set(query)):  # same summation order as oracle
            if t in tfs:
                s += score_py(tfs[t], df_t[t], r["doclen"], n_docs, avgdl)
        if s > 0:
            scores[r["doc_id"]] = s
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    assert [r["doc_id"] for r in got] == [d for d, _ in expect]
    for r, (_, s) in zip(got, expect):
        assert abs(r["score"] - s) < 1e-9


def test_oracle_empty_query_terms_absent(docs):
    assert bm25_topk_oracle(docs, ["zzz_not_a_term_zzz"], k=5).count() == 0


def test_oracle_k_larger_than_matches(docs):
    got = bm25_topk_oracle(docs, ["spark"], k=10**6)
    n_match = docs.filter(
        F.exists("terms", lambda x: x["term"] == "spark")
    ).count()
    assert got.count() == n_match
