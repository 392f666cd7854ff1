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


def test_fielded_update_crash_between_fields_replays(
    spark, webpages_small, tmp_path, monkeypatch
):
    """ADVICE r4: a crash after some sub-indexes committed a batch
    leaves fields at different n_docs. Replaying the SAME batch skips
    the committed fields (fingerprint match) and converges every field
    to the same n_docs/doc_ids; a DIFFERENT batch is refused while the
    fielded pending manifest is open."""
    from job_searchengine_project_spark.index import update as umod

    out = str(tmp_path / "idx_ftxn")
    a = webpages_small.limit(200)
    b = webpages_small.subtract(a)
    build_fielded_index(
        spark, _fielded_pages(a), out,
        fields={"title": "morph", "body": "morph"},
        target_postings_per_salt=50, term_buckets=16,
    )
    real = umod.update_index
    calls = {"n": 0}

    def flaky(spark_, pages_, sub, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # first field commits, second crashes
            raise RuntimeError("injected crash on second field")
        return real(spark_, pages_, sub, **kw)

    monkeypatch.setattr(umod, "update_index", flaky)
    with pytest.raises(RuntimeError, match="injected crash"):
        update_fielded_index(spark, _fielded_pages(b), out,
                             target_postings_per_salt=50)
    monkeypatch.setattr(umod, "update_index", real)
    # fields now disagree on n_docs; a different batch must be refused
    other = _fielded_pages(webpages_small.limit(50))
    with pytest.raises(RuntimeError, match="crashed mid-apply"):
        update_fielded_index(spark, other, out, target_postings_per_salt=50)
    # replaying the SAME batch completes: one field skips, one applies
    res = update_fielded_index(spark, _fielded_pages(b), out,
                               target_postings_per_salt=50)
    assert sorted(res) == ["body", "title"]
    assert any("skipped" in v for v in res.values())
    tmap = {
        r["url"]: r["doc_id"]
        for r in spark.read.parquet(f"{out}/fields/title/forward").collect()
    }
    bmap = {
        r["url"]: r["doc_id"]
        for r in spark.read.parquet(f"{out}/fields/body/forward").collect()
    }
    assert tmap == bmap and len(tmap) == 300
    # cross-field algebra still exact on the shared ids
    feng = FieldedSearchEngine(out)
    hits = feng.search_bool(must=[("body", QUERY)], filter=[("title", "spark")], k=50)
    for d, _ in hits:
        assert d in set(bmap.values())
    # the pending manifest is gone after the successful replay
    assert not os.path.exists(os.path.join(out, "_PENDING_FIELDED.json"))


def test_multi_match_best_fields(spark, fielded_index):
    """ES multi_match type=best_fields: max per-field score +
    tie_breaker x other matching fields (dis_max), vs most_fields SUM."""
    out, _ = fielded_index
    feng = FieldedSearchEngine(out)
    t_acc = feng._clause_acc("title", QUERY)
    b_acc = feng._clause_acc("body", QUERY)
    union = set(t_acc) | set(b_acc)

    def expect(tb):
        exp = {}
        for d in union:
            scores = [a[d] for a in (b_acc, t_acc) if d in a]  # sorted fields
            best = max(scores)
            bi = scores.index(best)
            exp[d] = best + sum(tb * s for j, s in enumerate(scores) if j != bi)
        return sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))

    for tb in (0.0, 0.3):
        got = feng.search_multi(QUERY, k=25, type="best_fields", tie_breaker=tb)
        assert got == expect(tb)[:25], tb
    # most_fields unchanged: sum of fields
    most = feng.search_multi(QUERY, k=25)
    exp_most = sorted(
        (
            (d, b_acc.get(d, 0.0) + t_acc.get(d, 0.0))
            for d in union
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )[:25]
    assert [(d, pytest.approx(s, abs=1e-12)) for d, s in exp_most] == most
    # DSL round-trip with type/tie_breaker
    r = feng.query({"query": {"multi_match": {
        "query": QUERY, "type": "best_fields", "tie_breaker": 0.3}}, "size": 5})
    want = feng.search_multi(QUERY, k=5, type="best_fields", tie_breaker=0.3)
    eng0 = feng.engine("body")
    eng0._fetch_urls([d for d, _ in want])
    assert [h["_id"] for h in r["hits"]["hits"]] == [eng0.url_of(d) for d, _ in want]
    assert r["hits"]["total"] == {"value": len(union), "relation": "eq"}
    with pytest.raises(ValueError):
        feng.search_multi(QUERY, type="cross_fields")


def test_fielded_prefix_wildcard_per_field(spark, fielded_index):
    """Each field's sub-index can carry its own sorted term dictionary:
    prefix/wildcard queries scope to that field's vocabulary."""
    from job_searchengine_project_spark.index.termdict import (
        build_term_dictionary,
        prefix_terms,
    )

    out, _ = fielded_index
    feng = FieldedSearchEngine(out)
    for field in ("title", "body"):
        sub = os.path.join(out, "fields", field)
        build_term_dictionary(spark, sub)
    t_terms = prefix_terms(os.path.join(out, "fields", "title"), "sp")
    b_terms = prefix_terms(os.path.join(out, "fields", "body"), "sp")
    assert set(t_terms) <= set(b_terms)  # the 60-char title sees fewer terms
    eng_t = feng.engine("title")
    hits = eng_t.search_prefix("sp", k=10**6, with_urls=False)
    assert {h.doc_id for h in hits} == eng_t._match_docs(t_terms)
    assert all(h.score == 1.0 for h in hits)


# ---- distributed fielded search (index/sharded_fielded.py) -------------------


@pytest.fixture(scope="module")
def sharded_fielded(spark, fielded_index):
    out, pages = fielded_index
    from job_searchengine_project_spark.index.sharded_fielded import (
        build_sharded_fielded,
        fielded_shards_fresh,
    )

    if not fielded_shards_fresh(out):
        build_sharded_fielded(spark, out, n_shards=4)
    return out


def test_sharded_multi_match_parity(spark, sharded_fielded):
    """VERDICT r4 #1: distributed multi_match == FieldedSearchEngine,
    both combiners. Per-doc float order is identical (sorted-term
    within field, sorted-field across — same accumulate_arrays
    kernel), so scores match exactly, not just ranks."""
    from job_searchengine_project_spark.index.sharded_fielded import (
        search_sharded_multi,
    )

    feng = FieldedSearchEngine(sharded_fielded)
    for typ, tb in (("most_fields", None), ("best_fields", 0.3),
                    ("best_fields", 0.0)):
        want = feng.search_multi(QUERY, k=25, type=typ, tie_breaker=tb)
        got = [
            (r["doc_id"], r["score"])
            for r in search_sharded_multi(
                spark, sharded_fielded, QUERY, k=25, type=typ, tie_breaker=tb
            ).collect()
        ]
        assert got == [(d, s) for d, s in want], (typ, tb)


def test_sharded_multi_match_field_subset_and_absent(spark, sharded_fielded):
    from job_searchengine_project_spark.index.sharded_fielded import (
        search_sharded_multi,
    )

    feng = FieldedSearchEngine(sharded_fielded)
    want = feng.search_multi(QUERY, fields=["title"], k=10)
    got = [
        (r["doc_id"], r["score"])
        for r in search_sharded_multi(
            spark, sharded_fielded, QUERY, fields=["title"], k=10
        ).collect()
    ]
    assert got == [(d, s) for d, s in want]
    assert (
        search_sharded_multi(spark, sharded_fielded, "zzznope", k=5).count() == 0
    )


def test_sharded_bool_fielded_parity(spark, sharded_fielded):
    """Distributed cross-field bool == FieldedSearchEngine.search_bool:
    same clause algebra over shard-local per-field accumulators."""
    from job_searchengine_project_spark.index.sharded_fielded import (
        search_sharded_bool_fielded,
    )

    feng = FieldedSearchEngine(sharded_fielded)
    cases = [
        dict(must=[("title", "spark"), ("body", "데이터엔지니어")]),
        dict(must=[("body", "spark")], should=[("title", "데이터엔지니어")],
             minimum_should_match=0),
        dict(must=[("body", "spark")], must_not=[("title", "데이터엔지니어")]),
        dict(should=[("title", "spark"), ("body", "데이터엔지니어")],
             minimum_should_match=1),
        dict(must=[("body", "spark")], filter=[("title", "spark")]),
    ]
    for kw in cases:
        want = feng.search_bool(k=50, **kw)
        got = [
            (r["doc_id"], r["score"])
            for r in search_sharded_bool_fielded(
                spark, sharded_fielded, k=50, **kw
            ).collect()
        ]
        assert got == [(d, s) for d, s in want], kw


def test_query_sharded_fielded_routing(spark, sharded_fielded):
    """The distributed DSL endpoint on a FIELDED dir: multi_match
    bodies answer through the sharded fielded kernels, match leaves
    route to the named field's sub-index with its analyzer, totals
    exact — parity with FieldedSearchEngine.query()."""
    from job_searchengine_project_spark.search.cluster import query_sharded

    feng = FieldedSearchEngine(sharded_fielded)
    bodies = [
        {"query": {"multi_match": {"query": QUERY, "type": "most_fields"}},
         "size": 8},
        {"query": {"multi_match": {"query": QUERY, "type": "best_fields",
                                   "tie_breaker": 0.3}}, "size": 8},
        {"query": {"match": {"title": QUERY}}, "size": 6},
    ]
    for body in bodies:
        want = feng.query(body)
        got = query_sharded(spark, sharded_fielded, body)
        assert got["hits"]["total"] == want["hits"]["total"], body
        assert [
            (h["_id"], round(h["_score"], 9)) for h in got["hits"]["hits"]
        ] == [
            (h["_id"], round(h["_score"], 9)) for h in want["hits"]["hits"]
        ], body


def test_sharded_fielded_freshness(spark, webpages_small, tmp_path):
    """A fielded update stales every sub-layout; the distributed
    fielded paths refuse until build_sharded_fielded reruns."""
    from job_searchengine_project_spark.index.sharded_fielded import (
        build_sharded_fielded,
        fielded_shards_fresh,
        search_sharded_multi,
    )

    out = str(tmp_path / "fielded_fresh")
    base = webpages_small.limit(200)
    build_fielded_index(
        spark, _fielded_pages(base), out,
        fields={"title": "morph", "body": "morph"},
        target_postings_per_salt=50, term_buckets=16,
    )
    build_sharded_fielded(spark, out, n_shards=3)
    assert fielded_shards_fresh(out)
    assert search_sharded_multi(spark, out, QUERY, k=5).count() > 0
    extra = webpages_small.limit(220).subtract(base)
    update_fielded_index(spark, _fielded_pages(extra), out)
    assert not fielded_shards_fresh(out)
    with pytest.raises(ValueError, match="stale"):
        search_sharded_multi(spark, out, QUERY, k=5).count()
    build_sharded_fielded(spark, out, n_shards=3)
    assert fielded_shards_fresh(out)
    n = FieldedSearchEngine(out).engine("body").n_eff
    assert n == 220


@pytest.fixture(scope="module")
def fielded_full(spark, webpages_small, tmp_path_factory):
    """Fielded index with the FULL sidecar surface: shared doc-values,
    positions, per-field fuzzy variants + term dictionary, sharded."""
    from job_searchengine_project_spark.index.fuzzy import build_fuzzy_variants
    from job_searchengine_project_spark.index.sharded_fielded import (
        build_sharded_fielded,
    )
    from job_searchengine_project_spark.index.termdict import (
        build_term_dictionary,
    )

    out = str(tmp_path_factory.mktemp("idx_fielded_full"))
    pages = _fielded_pages(webpages_small).withColumn(
        "n_chars", F.length("body")
    )
    build_fielded_index(
        spark, pages, out, fields={"title": "morph", "body": "morph"},
        doc_values=["n_chars"], with_positions=True,
        target_postings_per_salt=50, term_buckets=16,
    )
    build_sharded_fielded(spark, out, n_shards=3)
    body_sub = os.path.join(out, "fields", "body")
    build_fuzzy_variants(spark, body_sub, max_edits=1)
    build_term_dictionary(spark, body_sub)
    return out


def test_query_sharded_fielded_bool_with_specs(spark, fielded_full):
    """Field-targeted bool through the distributed endpoint: match
    leaves carry fields, range specs hit the SHARED top-level
    doc-values (shard-partitioned by build_sharded_fielded) — parity
    with FieldedSearchEngine.query, exact totals included."""
    from job_searchengine_project_spark.search.cluster import query_sharded

    feng = FieldedSearchEngine(fielded_full)
    body = {
        "query": {"bool": {
            "must": [{"match": {"body": "spark"}}],
            "should": [{"match": {"title": "데이터엔지니어"}}],
            "filter": [{"range": {"n_chars": {"gte": 300}}}],
        }},
        "size": 12,
    }
    want = feng.query(body)
    got = query_sharded(spark, fielded_full, body)
    assert got["hits"]["total"] == want["hits"]["total"]
    assert [
        (h["_id"], round(h["_score"], 9)) for h in got["hits"]["hits"]
    ] == [(h["_id"], round(h["_score"], 9)) for h in want["hits"]["hits"]]
    assert want["hits"]["total"]["value"] > 0


def test_query_sharded_fielded_phrase_fuzzy_prefix(spark, fielded_full):
    """Single-field kinds route to the named field's COMPLETE
    sub-index: match_phrase (positions), fuzzy (persisted variants),
    prefix/wildcard (term dictionary) — each against the driver
    fielded engine or the field engine directly."""
    from job_searchengine_project_spark.search.cluster import query_sharded

    feng = FieldedSearchEngine(fielded_full)
    # phrase on title (driver fielded DSL supports match_phrase)
    pb = {"query": {"match_phrase": {"title": "spark 데이터엔지니어"}}, "size": 5}
    want = feng.query(pb)
    got = query_sharded(spark, fielded_full, pb)
    assert got["hits"]["total"] == want["hits"]["total"]
    assert [h["_id"] for h in got["hits"]["hits"]] == [
        h["_id"] for h in want["hits"]["hits"]
    ]
    # fuzzy on body
    fb = {"query": {"fuzzy": {"body": {"value": "sparq", "fuzziness": 1}}},
          "size": 5}
    wantf = feng.query(fb)
    gotf = query_sharded(spark, fielded_full, fb)
    assert gotf["hits"]["total"] == wantf["hits"]["total"]
    assert [h["_id"] for h in gotf["hits"]["hits"]] == [
        h["_id"] for h in wantf["hits"]["hits"]
    ]
    # prefix on body (constant_score): compare against the field
    # engine's expansion directly — the fielded DSL has no prefix kind
    eng_b = feng.engine("body")
    want_ids = sorted(h.doc_id for h in eng_b.search_prefix("spar", k=10**6))
    gotp = query_sharded(
        spark, fielded_full,
        {"query": {"prefix": {"body": {"value": "spar"}}}, "size": 10_000},
    )
    assert gotp["hits"]["total"]["value"] == len(want_ids)
    # unknown field still raises
    with pytest.raises(ValueError, match="unknown field"):
        query_sharded(
            spark, fielded_full,
            {"query": {"match": {"nope": "spark"}}, "size": 3},
        )


def test_sharded_bool_fielded_filter_specs(spark, fielded_full):
    """filter_specs on the fielded distributed bool evaluate against
    each shard's slice of the SHARED sidecars — equal to the driver
    fielded bool gated by the equivalent precomputed doc set."""
    from job_searchengine_project_spark.index.sharded_fielded import (
        search_sharded_bool_fielded,
    )

    feng = FieldedSearchEngine(fielded_full)
    gate = feng.doc_values_docs("n_chars", gte=500)
    want = feng.search_bool(
        must=[("body", "spark")], filter_docs=[gate], k=40
    )
    got = [
        (r["doc_id"], r["score"])
        for r in search_sharded_bool_fielded(
            spark, fielded_full, must=[("body", "spark")],
            filter_specs=[{"col": "n_chars", "gte": 500}], k=40,
        ).collect()
    ]
    assert got == [(d, s) for d, s in want] and got
    # termless pure-spec form returns the gated set, doc_id order
    got0 = [
        r["doc_id"]
        for r in search_sharded_bool_fielded(
            spark, fielded_full,
            filter_specs=[{"col": "n_chars", "gte": 500}], k=10**6,
        ).collect()
    ]
    assert got0 == sorted(gate)


def test_fielded_spec_only_filter_excludes_tombstones(
    spark, fielded_full, tmp_path
):
    """ADVICE r5 #1 regression: fielded layouts keep tombstones per
    sub-index (fields/<f>/deleted); the distributed doc-values filter
    used to anti-join only <dir>/deleted (absent on fielded dirs), so
    a spec-only fielded query returned tombstoned docs and inflated
    totals until a purge. It must match the driver twin
    (FieldedSearchEngine.doc_values_docs: first sub-index tombstones)."""
    import shutil

    from job_searchengine_project_spark.index.sharded import (
        dv_filter_docs_sharded,
    )
    from job_searchengine_project_spark.index.tombstone import delete_docs
    from job_searchengine_project_spark.search.cluster import query_sharded

    out = str(tmp_path / "idx_fielded_del")
    shutil.copytree(fielded_full, out)
    feng = FieldedSearchEngine(out)
    before = feng.doc_values_docs("n_chars", gte=300)
    assert before
    victim = sorted(before)[0]
    url = feng.engine("body").url_of(victim)
    for f in ("body", "title"):  # fielded deletes apply to every field
        delete_docs(spark, os.path.join(out, "fields", f), [url])

    got = {
        int(r["doc_id"])
        for r in dv_filter_docs_sharded(
            spark, out, {"col": "n_chars", "gte": 300}
        ).collect()
    }
    want = FieldedSearchEngine(out).doc_values_docs("n_chars", gte=300)
    assert victim not in got
    assert got == set(want)

    # end-to-end: the distributed spec-only request's exact total
    # agrees with the driver fielded engine after the delete
    body = {
        "query": {"range": {"n_chars": {"gte": 300}}},
        "size": 0,
    }
    got_total = query_sharded(spark, out, body)["hits"]["total"]["value"]
    assert got_total == len(want)
