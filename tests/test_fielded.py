"""Per-field indexing: field-scoped stats/analyzers, shared doc ids,
multi_match most_fields scoring (ES multi-field mapping parity —
reference schema/es/es.sh:33-46, queries README.md:43-71)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from job_searchengine_project_spark.index.fielded import (
    FieldedSearchEngine,
    build_fielded_index,
    update_fielded_index,
)
from job_searchengine_project_spark.index.prepare import prepare_docs
from job_searchengine_project_spark.search.bm25 import bm25_topk_oracle

QUERY = "spark 데이터엔지니어"


def _fielded_pages(webpages):
    """Derive a multi-field page table: short title + full body."""
    return webpages.select(
        "url",
        F.substring(F.col("text"), 1, 60).alias("title"),
        F.col("text").alias("body"),
    )


@pytest.fixture(scope="module")
def fielded_index(spark, webpages_small, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_fielded"))
    pages = _fielded_pages(webpages_small)
    res = build_fielded_index(
        spark, pages, out,
        fields={"title": "morph", "body": "morph"},
        target_postings_per_salt=50, term_buckets=16,
    )
    assert res["title"]["n_docs"] == res["body"]["n_docs"] == 300
    return out, pages


def test_doc_ids_shared_across_fields(spark, fielded_index):
    """Deterministic url-derived ids: every field's sub-index agrees on
    (url -> doc_id) with no cross-field coordination."""
    out, _ = fielded_index
    t = {
        r["url"]: r["doc_id"]
        for r in spark.read.parquet(f"{out}/fields/title/forward")
        .select("url", "doc_id").collect()
    }
    b = {
        r["url"]: r["doc_id"]
        for r in spark.read.parquet(f"{out}/fields/body/forward")
        .select("url", "doc_id").collect()
    }
    assert t == b and len(t) == 300


def test_field_scoped_search_matches_per_field_oracle(spark, fielded_index):
    """A title query and a body query rank DIFFERENTLY, and each
    matches the DataFrame BM25 oracle over that field's corpus with
    that field's stats — per-field df/avgdl, the ES per-field BM25."""
    out, pages = fielded_index
    feng = FieldedSearchEngine(out)
    ranked = {}
    for field in ("title", "body"):
        hits = feng.search_field(QUERY, field, k=10, with_urls=True)
        docs_f = prepare_docs(pages.select("url", F.col(field).alias("text")))
        sub_eng = feng.engine(field)
        oracle = bm25_topk_oracle(
            docs_f, ["spark", "데이터엔지니어"], k=10,
            n_docs=sub_eng.n_docs, avgdl=sub_eng.avgdl,
        ).collect()
        assert [h.doc_id for h in hits] == [r["doc_id"] for r in oracle], field
        assert [h.url for h in hits] == [r["url"] for r in oracle], field
        for h, r in zip(hits, oracle):
            assert abs(h.score - r["score"]) < 1e-9
        ranked[field] = [h.doc_id for h in hits]
    assert ranked["title"] != ranked["body"]  # field scoping is load-bearing
    # per-field stats really differ (title is a 60-char prefix)
    assert feng.engine("title").avgdl < feng.engine("body").avgdl


def test_multi_match_most_fields_sum(spark, fielded_index):
    """search_multi == per-doc sum of the two field scores (ES
    multi_match type=most_fields), tie-break ascending doc_id."""
    out, _ = fielded_index
    feng = FieldedSearchEngine(out)
    terms = ["spark", "데이터엔지니어"]
    expected: dict[int, float] = {}
    for field in sorted(("title", "body")):
        for d, s in feng.engine(field).accumulate_scores(terms).items():
            expected[d] = expected.get(d, 0.0) + s
    want = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = feng.search_multi(QUERY, k=10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (d1, s1), (d2, s2) in zip(got, want):
        assert abs(s1 - s2) < 1e-12


def test_fielded_2gram_field(spark, webpages_small, tmp_path):
    """A 2-gram field analyzes its queries with the 2-gram analyzer
    (the reference's title/body_text mapping) while a morph field in
    the SAME index keeps morph analysis."""
    out = str(tmp_path / "idx_f2g")
    pages = _fielded_pages(webpages_small.limit(120))
    build_fielded_index(
        spark, pages, out,
        fields={"title": "2gram", "body": "morph"},
        target_postings_per_salt=2000, term_buckets=8,
    )
    feng = FieldedSearchEngine(out)
    assert feng.engine("title").stats["analyzer"] == "2gram"
    hits = feng.search_field("데이터엔지니어", "title", k=5, with_urls=False)
    assert hits  # 2-gram'd query matches 2-gram index
    from job_searchengine_project_spark.functions.tokenize import tokenize_2gram_py

    manual = feng.engine("title").search(
        tokenize_2gram_py("데이터엔지니어"), k=5, with_urls=False
    )
    assert [(h.doc_id, h.score) for h in hits] == [
        (h.doc_id, h.score) for h in manual
    ]


def test_fielded_update_keeps_shared_ids(spark, webpages_small, tmp_path):
    out = str(tmp_path / "idx_fupd")
    a = webpages_small.limit(200)
    b = webpages_small.subtract(a)
    build_fielded_index(
        spark, _fielded_pages(a), out,
        fields={"title": "morph", "body": "morph"},
        target_postings_per_salt=50, term_buckets=16,
    )
    res = update_fielded_index(spark, _fielded_pages(b), out,
                               target_postings_per_salt=50)
    assert res["title"]["added_docs"] == res["body"]["added_docs"] == 100
    t = {
        r["url"]: r["doc_id"]
        for r in spark.read.parquet(f"{out}/fields/title/forward").collect()
    }
    bmap = {
        r["url"]: r["doc_id"]
        for r in spark.read.parquet(f"{out}/fields/body/forward").collect()
    }
    assert t == bmap and len(t) == 300
    feng = FieldedSearchEngine(out)
    hits = feng.search_field(QUERY, "body", k=300, with_urls=False)
    assert any(h.doc_id >= 200 for h in hits)  # new batch is searchable


def test_stored_fields_written_once(spark, fielded_index):
    out, _ = fielded_index
    assert os.path.isdir(os.path.join(out, "stored"))
    for f in ("title", "body"):
        assert not os.path.isdir(os.path.join(out, "fields", f, "stored"))
    stored = spark.read.parquet(os.path.join(out, "stored"))
    assert stored.count() == 300
    assert {"title", "body"} <= set(stored.columns)


def test_field_scoped_distributed_search(spark, fielded_index):
    """A field's sub-index is a full index: the doc-range-sharded
    distributed path works per field unchanged."""
    from job_searchengine_project_spark.index.sharded import (
        build_sharded_segments,
        search_sharded,
    )

    out, _ = fielded_index
    sub = os.path.join(out, "fields", "title")
    build_sharded_segments(spark, sub, n_shards=3)
    feng = FieldedSearchEngine(out)
    driver_hits = feng.search_field(QUERY, "title", k=10, with_urls=True)
    dist = search_sharded(
        spark, sub, ["spark", "데이터엔지니어"], k=10
    ).collect()
    assert [r["doc_id"] for r in dist] == [h.doc_id for h in driver_hits]
    for r, h in zip(dist, driver_hits):
        assert abs(r["score"] - h.score) < 1e-9


def test_fielded_phrase_scopes_to_field(spark, webpages_small, tmp_path):
    """match_phrase on the TITLE field only sees phrases inside the
    60-char prefix; the same phrase on BODY matches a superset."""
    out = str(tmp_path / "fph")
    pages = _fielded_pages(webpages_small)
    build_fielded_index(
        spark, pages, out,
        fields={"title": "2gram", "body": "2gram"},
        with_positions=True, term_buckets=16, store_fields=False,
    )
    feng = FieldedSearchEngine(out)
    phrase = "spark"  # 2gram-analyzed to a 4-gram positional sequence
    t_hits = {h.doc_id for h in feng.search_phrase_field(phrase, "title", k=10**9, with_urls=False)}
    b_hits = {h.doc_id for h in feng.search_phrase_field(phrase, "body", k=10**9, with_urls=False)}
    assert t_hits and t_hits < b_hits
    # independent truth from the raw text (ids from the forward index)
    rows = pages.select("url", "title", "body").collect()
    ids = {
        r["url"]: r["doc_id"]
        for r in spark.read.parquet(f"{out}/fields/body/forward")
        .select("url", "doc_id").collect()
    }
    want_t = {ids[r["url"]] for r in rows if "spark" in r["title"].lower()}
    want_b = {ids[r["url"]] for r in rows if "spark" in r["body"].lower()}
    assert t_hits == want_t and b_hits == want_b


def test_unknown_field_raises(fielded_index):
    out, _ = fielded_index
    feng = FieldedSearchEngine(out)
    with pytest.raises(KeyError, match="unknown field"):
        feng.search_field("spark", "nope")
