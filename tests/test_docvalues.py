"""Doc-values sidecars: value-sorted per-column filter artifacts
(index/build.py _write_doc_values) behind ES range/term filters."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from job_searchengine_project_spark.index.build import build_index
from job_searchengine_project_spark.index.update import update_index
from job_searchengine_project_spark.search.engine import SearchEngine


@pytest.fixture(scope="module")
def dv_index(spark, webpages_small, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idxdv"))
    pages = webpages_small.withColumn(
        "n_chars", F.length("text")
    ).withColumn("site", F.substring("url", 9, 7))
    build_index(spark, pages, out, doc_values=["n_chars", "site"])
    return out, pages


def _truth(spark, out, pages, pred):
    fwd = spark.read.parquet(os.path.join(out, "forward")).select("doc_id", "url")
    return {
        r["doc_id"]
        for r in fwd.join(pages.filter(pred).select("url"), "url").collect()
    }


def test_range_and_term_match_bruteforce(spark, dv_index):
    out, pages = dv_index
    eng = SearchEngine(out)
    got = eng.doc_values_docs("n_chars", gte=500, lt=900)
    want = _truth(spark, out, pages, (F.col("n_chars") >= 500) & (F.col("n_chars") < 900))
    assert got == want and got
    site = pages.select("site").first()["site"]
    got_t = eng.doc_values_docs("site", eq=site)
    want_t = _truth(spark, out, pages, F.col("site") == site)
    assert got_t == want_t and got_t


def test_sidecar_files_are_value_sorted(dv_index):
    out, _ = dv_index
    root = os.path.join(out, "docvalues", "n_chars")
    vals = []
    for f in sorted(os.listdir(root)):
        if f.endswith(".parquet"):
            col = pq.read_table(os.path.join(root, f), columns=["n_chars"])
            v = col.column("n_chars").to_pylist()
            assert v == sorted(v), f  # row-group stats prune only if sorted
            vals += v
    assert vals


def test_unknown_column_and_no_bounds(dv_index):
    out, _ = dv_index
    eng = SearchEngine(out)
    with pytest.raises(KeyError):
        eng.doc_values_docs("nope", eq=1)
    with pytest.raises(ValueError):
        eng.doc_values_docs("n_chars")


def test_update_appends_doc_values(spark, webpages_small, tmp_path):
    from job_searchengine_project_spark.corpus import generate_webpages

    out = str(tmp_path / "idx")
    with_cols = lambda df: df.withColumn("n_chars", F.length("text")).withColumn(
        "site", F.substring("url", 9, 7)
    )
    base = with_cols(webpages_small)
    build_index(spark, base, out, doc_values=["n_chars", "site"])
    extra = with_cols(
        generate_webpages(spark, n_docs=80, vocab_size=500, seed=99).withColumn(
            "url", F.concat(F.lit("upd-"), F.col("url"))
        )
    )
    update_index(spark, extra, out)
    eng = SearchEngine(out)
    got = eng.doc_values_docs("n_chars", gte=0)
    assert len(got) == 380  # base 300 + 80 new docs all present
    # bool filter over the combined generations agrees with brute force
    pages_all = base.unionByName(extra)
    want = _truth(spark, out, pages_all, F.col("n_chars") >= 700)
    assert eng.doc_values_docs("n_chars", gte=700) == want


def test_field_sort(spark, dv_index):
    out, pages = dv_index
    eng = SearchEngine(out)
    from job_searchengine_project_spark.corpus import HEAD_TERMS

    t = HEAD_TERMS[1]
    resp = eng.query(
        {"query": {"match": {"b": t}},
         "sort": [{"site": "desc"}, {"n_chars": {"order": "asc"}}],
         "size": 10**6}
    )
    hits = resp["hits"]["hits"]
    assert hits
    keys = [(h["sort"][0], h["sort"][1]) for h in hits]
    # desc site (string) first, asc n_chars inside equal sites
    for a, b in zip(keys, keys[1:]):
        assert a[0] > b[0] or (a[0] == b[0] and a[1] <= b[1])
    # same doc set as the unsorted query
    plain = eng.query({"query": {"match": {"b": t}}, "size": 10**6})
    assert {h["_id"] for h in hits} == {h["_id"] for h in plain["hits"]["hits"]}
    # sort pagination tiles
    p1 = eng.query({"query": {"match": {"b": t}},
                    "sort": [{"n_chars": "asc"}], "from": 0, "size": 5})
    p2 = eng.query({"query": {"match": {"b": t}},
                    "sort": [{"n_chars": "asc"}], "from": 5, "size": 5})
    full = eng.query({"query": {"match": {"b": t}},
                      "sort": [{"n_chars": "asc"}], "size": 10})
    assert [h["_id"] for h in p1["hits"]["hits"] + p2["hits"]["hits"]] == [
        h["_id"] for h in full["hits"]["hits"]
    ]


def test_aggregations(spark, dv_index):
    out, pages = dv_index
    eng = SearchEngine(out)
    # unscoped terms agg == full group-by
    want = {
        (r["site"], r["cnt"])
        for r in pages.groupBy("site").agg(F.count("*").alias("cnt")).collect()
    }
    got = set(eng.aggregate_terms("site", size=10**6))
    assert got == want
    # doc_filter scopes the agg (ES query context)
    gate = eng.doc_values_docs("n_chars", gte=700)
    scoped = dict(eng.aggregate_terms("site", size=10**6, doc_filter=gate))
    fwd = {r["doc_id"]: r["url"] for r in spark.read.parquet(out + "/forward").select("doc_id", "url").collect()}
    sites = {r["url"]: r["site"] for r in pages.select("url", "site").collect()}
    want_scoped: dict = {}
    for d in gate:
        want_scoped[sites[fwd[d]]] = want_scoped.get(sites[fwd[d]], 0) + 1
    assert scoped == want_scoped
    # histogram buckets ascending, counts sum to corpus size
    h = eng.aggregate_histogram("n_chars", interval=200)
    assert [k for k, _ in h] == sorted(k for k, _ in h)
    assert sum(n for _, n in h) == 300
    # DSL envelope + unsupported agg kind
    resp = eng.query({"size": 0, "aggs": {"s": {"terms": {"field": "site"}}}})
    assert resp["aggregations"]["s"]["buckets"]
    assert resp["hits"]["hits"] == []
    # metric aggs are supported (round 4); an unknown kind still raises
    r_avg = eng.query({"aggs": {"x": {"avg": {"field": "n_chars"}}}})
    vals = [r["n_chars"] for r in pages.select("n_chars").collect()]
    assert r_avg["aggregations"]["x"]["value"] == sum(vals) / len(vals)
    # cardinality is supported too (exact-distinct contract)
    r_cd = eng.query({"aggs": {"x": {"cardinality": {"field": "n_chars"}}}})
    assert r_cd["aggregations"]["x"]["value"] == len(set(vals))
    # percentiles: exact linear interpolation (numpy == quantile_cont)
    r_p = eng.query(
        {"aggs": {"x": {"percentiles": {"field": "n_chars",
                                        "percents": [50.0]}}}}
    )
    import numpy as _np

    assert r_p["aggregations"]["x"]["values"]["50.0"] == float(
        _np.percentile(_np.asarray(vals, dtype=float), 50.0)
    )
    # an unknown agg kind still raises (implausible on purpose)
    with pytest.raises(ValueError):
        eng.query({"aggs": {"x": {"median_absolute_deviation": {"field": "n_chars"}}}})


def test_fielded_doc_values(spark, webpages_small, tmp_path):
    """One top-level sidecar set serves every field's sub-index
    (shared doc ids): range filters gate field-scoped bool queries."""
    from job_searchengine_project_spark.index.fielded import (
        FieldedSearchEngine,
        build_fielded_index,
    )

    out = str(tmp_path / "fdv")
    pages = webpages_small.select(
        "url",
        F.substring("text", 1, 60).alias("title"),
        F.col("text").alias("body"),
    ).withColumn("n_chars", F.length("body"))
    build_fielded_index(
        spark, pages, out, fields={"title": "morph", "body": "morph"},
        store_fields=False, doc_values=["n_chars"],
    )
    feng = FieldedSearchEngine(out)
    gate = feng.doc_values_docs("n_chars", gte=800)
    fwd = {
        r["url"]: r["doc_id"]
        for r in spark.read.parquet(f"{out}/fields/body/forward")
        .select("url", "doc_id").collect()
    }
    want = {
        fwd[r["url"]] for r in pages.filter(F.col("n_chars") >= 800).collect()
    }
    assert gate == want and gate
    # DSL: title-scoped match gated by the range filter
    from job_searchengine_project_spark.corpus import HEAD_TERMS

    t = HEAD_TERMS[1]
    resp = feng.query(
        {"query": {"bool": {"must": [{"match": {"title": t}}],
                            "filter": [{"range": {"n_chars": {"gte": 800}}}]}},
         "size": 10**6}
    )
    base = dict(feng.search_bool(must=[("title", t)], k=10**6))
    got = {fwd[h["_id"]]: h["_score"] for h in resp["hits"]["hits"]}
    assert set(got) == set(base) & gate
    for d, s in got.items():
        assert s == base[d]  # filter context never scores
    with pytest.raises(KeyError):
        feng.doc_values_docs("nope", eq=1)


def _hash_tree(root):
    import hashlib

    out = {}
    for r, _, fs in os.walk(root):
        for f in fs:
            p = os.path.join(r, f)
            out[os.path.relpath(p, root)] = hashlib.md5(open(p, "rb").read()).hexdigest()
    return out


def test_docvalues_crash_rolls_back_and_replays(spark, webpages_small, tmp_path):
    """A crashed update (after the doc-values append, before the stats
    commit) must roll the docvalues sidecars back with everything else
    — the new subdir is covered by the pending manifest — and the
    replay must land the combined filter set exactly once."""
    from job_searchengine_project_spark.index.update import recover_index

    out = str(tmp_path / "idx")
    with_cols = lambda df: df.withColumn("n_chars", F.length("text"))
    a = with_cols(webpages_small.limit(200))
    b = with_cols(webpages_small).subtract(a)
    build_index(spark, a, out, target_postings_per_salt=50,
                term_buckets=16, doc_values=["n_chars"])
    pre = _hash_tree(os.path.join(out, "docvalues"))
    base_set = SearchEngine(out).doc_values_docs("n_chars", gte=0)

    with pytest.raises(RuntimeError, match="injected crash"):
        update_index(spark, b, out, target_postings_per_salt=50,
                     _fail_point="after_segments")
    recover_index(out)
    assert _hash_tree(os.path.join(out, "docvalues")) == pre
    assert SearchEngine(out).doc_values_docs("n_chars", gte=0) == base_set

    update_index(spark, b, out, target_postings_per_salt=50)
    eng = SearchEngine(out)
    assert len(eng.doc_values_docs("n_chars", gte=0)) == 300  # no dup rows
    # values still correct for the replayed generation
    want = _truth(
        spark, out, with_cols(webpages_small), F.col("n_chars") >= 900
    )
    assert eng.doc_values_docs("n_chars", gte=900) == want


def test_sharded_bool_with_doc_values_filter(spark, dv_index):
    """Distributed bool + broadcast doc-values hit sets == driver
    bool with the same sets, including the termless pure-filter case."""
    from job_searchengine_project_spark.corpus import HEAD_TERMS
    from job_searchengine_project_spark.index.sharded import (
        build_sharded_segments,
        search_sharded_bool,
    )

    out, _ = dv_index
    build_sharded_segments(spark, out, n_shards=4)
    eng = SearchEngine(out)
    t = HEAD_TERMS[1]
    gate = eng.doc_values_docs("n_chars", gte=700)
    excl = eng.doc_values_docs("n_chars", lt=450)
    want = [
        (h.doc_id, h.score)
        for h in eng.search_bool(
            must=[t], filter_docs=[gate], must_not_docs=[excl],
            k=50, with_urls=False,
        )
    ]
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in search_sharded_bool(
            spark, out, must=[t], filter_docs=[gate], must_not_docs=[excl], k=50
        ).collect()
    ]
    assert got == want and got
    # termless pure-filter: driver-side fallback, scores 0.0
    rows = search_sharded_bool(spark, out, filter_docs=[gate], k=20).collect()
    assert {r["doc_id"] for r in rows} <= gate
    assert all(r["score"] == 0.0 and r["url"] for r in rows) and rows


def test_fielded_update_appends_doc_values(spark, webpages_small, tmp_path):
    from job_searchengine_project_spark.corpus import generate_webpages
    from job_searchengine_project_spark.index.fielded import (
        FieldedSearchEngine,
        build_fielded_index,
        update_fielded_index,
    )

    def fielded(df):
        return df.select(
            "url",
            F.substring("text", 1, 60).alias("title"),
            F.col("text").alias("body"),
        ).withColumn("n_chars", F.length("body"))

    out = str(tmp_path / "fdvu")
    base = fielded(webpages_small)
    build_fielded_index(
        spark, base, out, fields={"title": "morph", "body": "morph"},
        store_fields=False, doc_values=["n_chars"],
    )
    extra = fielded(
        generate_webpages(spark, n_docs=50, vocab_size=500, seed=5).withColumn(
            "url", F.concat(F.lit("upd-"), F.col("url"))
        )
    )
    update_fielded_index(spark, extra, out)
    feng = FieldedSearchEngine(out)
    assert len(feng.doc_values_docs("n_chars", gte=0)) == 350
    fwd = {
        r["url"]: r["doc_id"]
        for r in spark.read.parquet(f"{out}/fields/body/forward")
        .select("url", "doc_id").collect()
    }
    allp = base.unionByName(extra)
    want = {fwd[r["url"]] for r in allp.filter(F.col("n_chars") >= 800).collect()}
    assert feng.doc_values_docs("n_chars", gte=800) == want


def test_replace_updates_doc_values_view(spark, webpages_small, tmp_path):
    """ES _id overwrite: a re-crawled doc's NEW doc-values row serves
    filters; the old version's row is tombstone-masked pre-purge and
    physically dropped by the purge."""
    from job_searchengine_project_spark.index.compact import compact_index

    out = str(tmp_path / "idx")
    pages = webpages_small.withColumn("n_chars", F.length("text"))
    build_index(spark, pages, out, doc_values=["n_chars"])
    # replace 30 urls with text 10x longer (n_chars changes decisively)
    repl = (
        webpages_small.limit(30)
        .select("url", F.concat(*[F.col("text")] * 10).alias("text"))
        .withColumn("n_chars", F.length("text"))
    )
    update_index(spark, repl, out, replace=True)
    repl_urls = {r["url"] for r in repl.select("url").collect()}
    big = int(repl.agg(F.min("n_chars")).collect()[0][0])
    # truth over the POST-replace corpus: replaced urls use their new
    # 10x length, everything else its original length
    want_urls = repl_urls | {
        r["url"]
        for r in pages.filter(
            (F.col("n_chars") >= big) & ~F.col("url").isin(list(repl_urls))
        ).collect()
    }
    for purged in (False, True):
        if purged:
            assert compact_index(spark, out)["purged_docs"] == 30
        eng = SearchEngine(out)
        hits = eng.doc_values_docs("n_chars", gte=big)
        fwd = {
            r["doc_id"]: r["url"]
            for r in spark.read.parquet(f"{out}/forward")
            .select("doc_id", "url").collect()
        }
        assert {fwd[d] for d in hits} == want_urls, purged
        # exactly one live row per matching url — the replaced urls'
        # OLD rows never leak in (tombstone mask pre-purge, dropped
        # rows post-purge)
        assert len(hits) == len(want_urls), purged


def test_purge_drops_doc_values_of_dead_docs(spark, webpages_small, tmp_path):
    """A purging compaction clears the tombstone files — doc-values
    rows of purged docs must go WITH them, or range/term filters would
    resurrect deleted docs. The rewrite also folds generations."""
    from job_searchengine_project_spark.index.compact import compact_index
    from job_searchengine_project_spark.index.tombstone import delete_docs

    out = str(tmp_path / "idx")
    pages = webpages_small.withColumn("n_chars", F.length("text"))
    build_index(spark, pages, out, doc_values=["n_chars"])
    eng = SearchEngine(out)
    all_docs = eng.doc_values_docs("n_chars", gte=0)
    victims = [r["url"] for r in pages.limit(40).select("url").collect()]
    victim_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/forward")
        .filter(F.col("url").isin(victims)).select("doc_id").collect()
    }
    delete_docs(spark, out, victims)
    # pre-purge: tombstone subtraction already hides them
    eng = SearchEngine(out)
    assert eng.doc_values_docs("n_chars", gte=0) == all_docs - victim_ids
    res = compact_index(spark, out)
    assert res["purged_docs"] == 40
    # post-purge: tombstones are gone — the sidecar itself must be clean
    eng2 = SearchEngine(out)
    assert eng2.tombstones.size == 0
    assert eng2.doc_values_docs("n_chars", gte=0) == all_docs - victim_ids
    # still value-sorted after the rewrite (pruning contract)
    root = os.path.join(out, "docvalues", "n_chars")
    for f in os.listdir(root):
        if f.endswith(".parquet"):
            v = pq.read_table(os.path.join(root, f), columns=["n_chars"]).column("n_chars").to_pylist()
            assert v == sorted(v)


def test_dsl_range_filter_end_to_end(spark, dv_index):
    out, pages = dv_index
    eng = SearchEngine(out)
    from job_searchengine_project_spark.corpus import HEAD_TERMS

    t = HEAD_TERMS[1]
    body = {
        "query": {
            "bool": {
                "must": [{"match": {"body": t}}],
                "filter": [{"range": {"n_chars": {"gte": 400}}}],
            }
        },
        "size": 10**6,
    }
    resp = eng.query(body)
    base = {h.doc_id: h.score for h in eng.search_bool(must=[t], k=10**6, with_urls=False)}
    gate = eng.doc_values_docs("n_chars", gte=400)
    ids = [h["_id"] for h in resp["hits"]["hits"]]
    # resolve returned urls back to doc ids via the forward index
    fwd = {r["url"]: r["doc_id"] for r in spark.read.parquet(os.path.join(out, "forward")).select("url", "doc_id").collect()}
    got_ids = {fwd[u] for u in ids}
    assert got_ids == set(base) & gate and got_ids
    for h in resp["hits"]["hits"]:  # filter context: scores unchanged
        assert h["_score"] == base[fwd[h["_id"]]]
    # range in a scoring context is rejected
    with pytest.raises(ValueError):
        eng.query({"query": {"bool": {"must": [{"range": {"n_chars": {"gte": 1}}}]}}})


def test_field_sort_null_values_sort_last(spark, webpages_small, tmp_path):
    """ADVICE r4: a doc whose doc-values entry is NULL must sort LAST
    under either order (ES missing=_last default), not raise a
    None-comparison TypeError."""
    out = str(tmp_path / "idxdv_null")
    pages = webpages_small.limit(60).withColumn(
        "n_chars",
        F.when(F.pmod(F.xxhash64("url"), F.lit(4)) == 0, F.lit(None)).otherwise(
            F.length("text")
        ),
    )
    build_index(spark, pages, out, doc_values=["n_chars"],
                target_postings_per_salt=50, term_buckets=16)
    eng = SearchEngine(out)
    n_null = pages.filter(F.col("n_chars").isNull()).count()
    assert n_null > 0
    from job_searchengine_project_spark.corpus import HEAD_TERMS

    for order in ("asc", "desc"):
        resp = eng.query(
            {"query": {"match": {"b": HEAD_TERMS[2]}},
             "sort": [{"n_chars": order}], "size": 10**6}
        )
        hits = resp["hits"]["hits"]
        assert hits
        keys = [h["sort"][0] for h in hits]
        seen_null = False
        prev = None
        for v in keys:
            if v is None:
                seen_null = True
                continue
            assert not seen_null, "non-null key after a null (missing must be last)"
            if prev is not None:
                assert v >= prev if order == "asc" else v <= prev
            prev = v


def test_sharded_spec_filters_no_driver_sets(spark, dv_index, monkeypatch):
    """VERDICT r3 #1: declarative filter_specs evaluate inside the
    shard kernels against shard-partitioned sidecar slices. Parity
    with the driver engine on a BROAD filter (>10% of docs), and the
    driver-side set builder is never called."""
    from job_searchengine_project_spark.corpus import HEAD_TERMS
    from job_searchengine_project_spark.index.sharded import (
        SHARD_DV_DIR,
        build_sharded_segments,
        search_sharded_bool,
    )
    from job_searchengine_project_spark.search import engine as engmod

    out, pages = dv_index
    build_sharded_segments(spark, out, n_shards=4)
    # shard-partitioned sidecars exist for every doc-values column
    for col in ("n_chars", "site"):
        assert os.path.isdir(os.path.join(out, SHARD_DV_DIR, col, "shard=0"))
    site0 = pages.select("site").first()["site"]
    eng = SearchEngine(out)
    t = HEAD_TERMS[1]
    # broad filter: n_chars >= 100 matches most of the corpus
    gate = eng.doc_values_docs("n_chars", gte=100)
    assert len(gate) > 30  # >10% of the 300-doc corpus
    excl = eng.doc_values_docs("n_chars", lt=450)
    want = [
        (h.doc_id, round(h.score, 9))
        for h in eng.search_bool(
            must=[t], filter_docs=[gate], must_not_docs=[excl],
            k=100, with_urls=False,
        )
    ]

    def boom(*a, **k):
        raise AssertionError("driver-side doc-values set built for sharded path")

    monkeypatch.setattr(engmod, "doc_values_docs_at", boom)
    got = [
        (int(r["doc_id"]), round(float(r["score"]), 9))
        for r in search_sharded_bool(
            spark, out, must=[t],
            filter_specs=[{"col": "n_chars", "gte": 100}],
            must_not_specs=[{"col": "n_chars", "lt": 450}],
            k=100,
        ).collect()
    ]
    assert got == want and got
    # termless pure-spec query: distributed DataFrame algebra
    rows = search_sharded_bool(
        spark, out,
        filter_specs=[{"col": "n_chars", "gte": 100}, {"col": "site", "eq": site0}],
        must_not_specs=[{"col": "n_chars", "gte": 2000}],
        k=20,
    ).collect()
    monkeypatch.undo()
    want_set = (
        eng.doc_values_docs("n_chars", gte=100)
        & eng.doc_values_docs("site", eq=site0)
    ) - eng.doc_values_docs("n_chars", gte=2000)
    assert rows and {r["doc_id"] for r in rows} == set(sorted(want_set)[:20])
    assert all(r["score"] == 0.0 and r["url"] for r in rows)


def test_distributed_aggregations_match_driver(spark, dv_index):
    """VERDICT r3 #2: terms/histogram aggs as one Spark groupBy over
    the sidecar table (partial agg + associative merge) equal the
    driver-side Counter oracle, scoped and unscoped."""
    from job_searchengine_project_spark.corpus import HEAD_TERMS
    from job_searchengine_project_spark.index.sharded import (
        aggregate_histogram_sharded,
        aggregate_terms_sharded,
        build_sharded_segments,
        dv_filter_docs_sharded,
        match_docs_sharded,
    )

    out, _ = dv_index
    build_sharded_segments(spark, out, n_shards=4)
    eng = SearchEngine(out)
    # unscoped terms agg
    got = [
        (r["key"], int(r["doc_count"]))
        for r in aggregate_terms_sharded(spark, out, "site", size=10).collect()
    ]
    assert got == eng.aggregate_terms("site", size=10)
    # query-scoped: hit set from the distributed match-docs path
    t = HEAD_TERMS[0]
    hits = match_docs_sharded(spark, out, eng._analyze(t))
    assert {r["doc_id"] for r in hits.collect()} == eng._match_docs(eng._analyze(t))
    got_scoped = [
        (r["key"], int(r["doc_count"]))
        for r in aggregate_terms_sharded(
            spark, out, "site", size=10, doc_filter=hits
        ).collect()
    ]
    want_scoped = eng.aggregate_terms(
        "site", size=10, doc_filter=eng._match_docs(eng._analyze(t))
    )
    assert got_scoped == want_scoped
    # histogram under a dv term filter
    gate_df = dv_filter_docs_sharded(spark, out, {"col": "n_chars", "lt": 900})
    got_h = [
        (float(r["key"]), int(r["doc_count"]))
        for r in aggregate_histogram_sharded(
            spark, out, "n_chars", 200, doc_filter=gate_df
        ).collect()
    ]
    want_h = eng.aggregate_histogram(
        "n_chars", 200, doc_filter=eng.doc_values_docs("n_chars", lt=900)
    )
    assert got_h == want_h and got_h


def test_dsl_search_after_with_sort(spark, dv_index):
    """ES search_after + sort: pages tile the full field-sorted
    ranking via each page's last sort tuple; `_doc` is the documented
    tiebreaker key; from alongside search_after is refused."""
    from job_searchengine_project_spark.corpus import HEAD_TERMS

    out, _ = dv_index
    eng = SearchEngine(out)
    t = HEAD_TERMS[1]
    sort = [{"n_chars": "desc"}, {"_doc": "asc"}]
    full = eng.query({"query": {"match": {"b": t}}, "sort": sort, "size": 10**6})
    all_ids = [h["_id"] for h in full["hits"]["hits"]]
    assert len(all_ids) > 12
    got, cursor = [], None
    for _ in range(100):
        body = {"query": {"match": {"b": t}}, "sort": sort, "size": 5}
        if cursor is not None:
            body["search_after"] = cursor
        page = eng.query(body)["hits"]["hits"]
        if not page:
            break
        got.extend(h["_id"] for h in page)
        cursor = page[-1]["sort"]
    assert got == all_ids
    with pytest.raises(ValueError, match="exclusive"):
        eng.query({"query": {"match": {"b": t}}, "sort": sort,
                   "search_after": [1, 2], "from": 3})
    with pytest.raises(ValueError, match="one value per sort key"):
        eng.query({"query": {"match": {"b": t}}, "sort": sort,
                   "search_after": [1]})


def test_query_sharded_matches_driver_engine(spark, dv_index):
    """The distributed ES endpoint (search/cluster.py query_sharded)
    answers the same request bodies as the driver engine: hits,
    exact totals, aggregations, field sort, count."""
    from job_searchengine_project_spark.corpus import HEAD_TERMS
    from job_searchengine_project_spark.index.fuzzy import (
        build_fuzzy_variants,
        variants_fresh,
    )
    from job_searchengine_project_spark.index.sharded import (
        SHARD_DV_DIR,
        build_sharded_segments,
    )
    from job_searchengine_project_spark.index.termdict import (
        build_term_dictionary,
        termdict_fresh,
    )
    from job_searchengine_project_spark.search.cluster import (
        count_sharded,
        query_sharded,
    )

    out, _ = dv_index
    if not os.path.isdir(os.path.join(out, SHARD_DV_DIR)):
        build_sharded_segments(spark, out, n_shards=4)
    if not variants_fresh(out, 1):
        build_fuzzy_variants(spark, out, max_edits=1)
    if not termdict_fresh(out):
        build_term_dictionary(spark, out)
    eng = SearchEngine(out)
    t = HEAD_TERMS[1]

    def ids_scores(resp, r=9):
        return [
            (h["_id"], None if h["_score"] is None else round(h["_score"], r))
            for h in resp["hits"]["hits"]
        ]

    bodies = [
        {"query": {"match": {"b": f"{t} {HEAD_TERMS[0]}"}}, "size": 7, "from": 3},
        {"query": {"bool": {
            "must": [{"match": {"b": t}}],
            "filter": [{"range": {"n_chars": {"gte": 100}}}],
            "must_not": [{"match": {"b": HEAD_TERMS[2]}}],
        }}, "size": 8},
        {"query": {"fuzzy": {"b": {"value": t[:-1] + "q", "fuzziness": 1}}},
         "size": 5},
        {"query": {"prefix": {"b": {"value": t[:3]}}}, "size": 6},
        {"query": {"match": {"b": t}}, "size": 0,
         "aggs": {"s": {"terms": {"field": "site", "size": 10}},
                  "h": {"histogram": {"field": "n_chars", "interval": 300}}}},
    ]
    for body in bodies:
        want = eng.query(body)
        got = query_sharded(spark, out, body)
        assert got["hits"]["total"] == want["hits"]["total"], body
        assert ids_scores(got) == ids_scores(want), body
        assert got.get("aggregations") == want.get("aggregations"), body
    # field sort: same page ids and sort tuples (driver gives scores,
    # the distributed sort skips them — ES null _score behavior)
    sbody = {"query": {"match": {"b": t}},
             "sort": [{"n_chars": "desc"}, {"_doc": "asc"}], "size": 6}
    wantS = eng.query(sbody)
    gotS = query_sharded(spark, out, sbody)
    assert [h["_id"] for h in gotS["hits"]["hits"]] == [
        h["_id"] for h in wantS["hits"]["hits"]
    ]
    assert [h["sort"] for h in gotS["hits"]["hits"]] == [
        h["sort"] for h in wantS["hits"]["hits"]
    ]
    # _count
    for body in bodies[:4]:
        assert count_sharded(spark, out, body) == eng.count(body), body


def test_terms_exists_match_all_queries(spark, dv_index):
    """ES terms (value list), exists (non-null), and match_all kinds —
    driver engine and distributed endpoint agree; filter-context
    composition works in bool bodies."""
    from job_searchengine_project_spark.search.cluster import query_sharded

    out, pages = dv_index
    eng = SearchEngine(out)
    sites = sorted({r["site"] for r in pages.select("site").distinct().collect()})
    vals = sites[:2] if len(sites) >= 2 else sites
    # terms == union of eq sets
    want = set()
    for v in vals:
        want |= eng.doc_values_docs("site", eq=v)
    assert eng.doc_values_docs("site", isin=vals) == want
    # exists == docs with non-null value
    n_all = len(eng.doc_values_docs("n_chars", exists=True))
    assert n_all == 300
    # standalone DSL kinds (filter-context sugar, score 0.0)
    r = eng.query({"query": {"terms": {"site": vals}}, "size": 5})
    assert r["hits"]["total"] == {"value": len(want), "relation": "eq"}
    assert all(h["_score"] == 0.0 for h in r["hits"]["hits"])
    r2 = eng.query({"query": {"exists": {"field": "n_chars"}}, "size": 3})
    assert r2["hits"]["total"]["value"] == n_all
    # match_all: every live doc, constant score 1.0
    r3 = eng.query({"query": {"match_all": {}}, "size": 4})
    assert r3["hits"]["total"]["value"] == 300
    assert all(h["_score"] == 1.0 for h in r3["hits"]["hits"])
    # bool composition with terms + exists leaves
    from job_searchengine_project_spark.corpus import HEAD_TERMS

    body = {"query": {"bool": {
        "must": [{"match": {"b": HEAD_TERMS[1]}}],
        "filter": [{"terms": {"site": vals}}, {"exists": {"field": "n_chars"}}],
    }}, "size": 10**6}
    rb = eng.query(body)
    base = {h.doc_id for h in eng.search_bool(must=[HEAD_TERMS[1]], k=10**6,
                                              with_urls=False)}
    assert rb["hits"]["total"]["value"] == len(base & want)
    # distributed endpoint parity (shards exist from earlier tests or build now)
    from job_searchengine_project_spark.index.sharded import (
        SHARD_DV_DIR,
        build_sharded_segments,
    )

    if not os.path.isdir(os.path.join(out, SHARD_DV_DIR)):
        build_sharded_segments(spark, out, n_shards=4)
    # size=10**6 means "everything" here: raise the window like the ES
    # index.max_result_window setting (the default cap is tested in
    # test_query_paths.py::test_query_sharded_cursor_pagination_and_window)
    gd = query_sharded(spark, out, body, max_result_window=10**6)
    assert gd["hits"]["total"] == rb["hits"]["total"]
    assert [h["_id"] for h in gd["hits"]["hits"]] == [
        h["_id"] for h in rb["hits"]["hits"]
    ]
    gt = query_sharded(spark, out, {"query": {"terms": {"site": vals}}, "size": 5})
    assert gt["hits"]["total"] == r["hits"]["total"]


def test_terms_subagg_and_percentiles_driver_vs_distributed(spark, dv_index):
    """VERDICT r4 #3/#5: nested terms sub-aggs and percentiles —
    driver engine (Counter/numpy oracle form) == distributed endpoint
    (one groupBy with extra agg exprs / one Spark percentile agg);
    the approx at-scale variants stay inside documented tolerance."""
    import numpy as np

    from job_searchengine_project_spark.corpus import HEAD_TERMS
    from job_searchengine_project_spark.index.sharded import (
        SHARD_DV_DIR,
        aggregate_percentiles_sharded,
        build_sharded_segments,
        match_docs_sharded,
        shards_fresh,
    )
    from job_searchengine_project_spark.search.cluster import query_sharded

    out, pages = dv_index
    if not (shards_fresh(out) and os.path.isdir(os.path.join(out, SHARD_DV_DIR))):
        build_sharded_segments(spark, out, n_shards=4)
    eng = SearchEngine(out)
    t = HEAD_TERMS[0]
    body = {
        "query": {"match": {"b": t}},
        "size": 0,
        "aggs": {
            "sites": {
                "terms": {"field": "site", "size": 5},
                "aggs": {
                    "avg_c": {"avg": {"field": "n_chars"}},
                    "mn": {"min": {"field": "n_chars"}},
                    "vc": {"value_count": {"field": "n_chars"}},
                    "cd": {"cardinality": {"field": "n_chars"}},
                },
            },
            "pct": {"percentiles": {"field": "n_chars",
                                    "percents": [10.0, 50.0, 90.0]}},
        },
    }
    want = eng.query(body)
    got = query_sharded(spark, out, body)
    for wb, gb in zip(
        want["aggregations"]["sites"]["buckets"],
        got["aggregations"]["sites"]["buckets"],
    ):
        assert gb["key"] == wb["key"] and gb["doc_count"] == wb["doc_count"]
        for sub in ("avg_c", "mn", "vc", "cd"):
            assert gb[sub]["value"] == wb[sub]["value"], (sub, wb["key"])
    assert got["aggregations"]["pct"]["values"] == pytest.approx(
        want["aggregations"]["pct"]["values"], abs=1e-9
    )
    # sub-aggs under a non-terms agg raise on both engines
    bad = {"aggs": {"h": {"histogram": {"field": "n_chars", "interval": 100},
                          "aggs": {"a": {"avg": {"field": "n_chars"}}}}}}
    with pytest.raises(ValueError):
        eng.query(bad)
    with pytest.raises(ValueError):
        query_sharded(spark, out, bad)
    # approx percentile variant: bounded error against the exact form
    scope = match_docs_sharded(spark, out, eng._analyze(t))
    exact = {
        r["percent"]: r["value"]
        for r in aggregate_percentiles_sharded(
            spark, out, "n_chars", [50.0], doc_filter=scope
        ).collect()
    }
    approx = {
        r["percent"]: r["value"]
        for r in aggregate_percentiles_sharded(
            spark, out, "n_chars", [50.0], doc_filter=scope, exact=False
        ).collect()
    }
    spread = max(v for v in exact.values()) or 1.0
    assert abs(approx[50.0] - exact[50.0]) <= 0.05 * spread
    # approx cardinality twin (HLL, the ES-native behavior) within 5%
    from job_searchengine_project_spark.index.sharded import _live_dv_table

    exact_cd = (
        _live_dv_table(spark, out, "n_chars")
        .join(scope, "doc_id", "left_semi")
        .agg(F.countDistinct("n_chars")).collect()[0][0]
    )
    approx_cd = (
        _live_dv_table(spark, out, "n_chars")
        .join(scope, "doc_id", "left_semi")
        .agg(F.approx_count_distinct("n_chars", 0.02)).collect()[0][0]
    )
    assert abs(approx_cd - exact_cd) <= max(2, 0.05 * exact_cd)


def test_fixed_interval_parse_and_date_histogram(spark, dv_index):
    """ES fixed_interval parsing (ms/s/m/h/d; calendar units refused)
    and date_histogram over a timestamp sidecar: driver numpy form ==
    distributed unix_millis groupBy."""
    import datetime as dt

    from job_searchengine_project_spark.index.build import build_index as _bi
    from job_searchengine_project_spark.index.sharded import (
        aggregate_date_histogram_sharded,
        build_sharded_segments,
    )

    SE = SearchEngine
    assert SE.parse_fixed_interval("1d") == 86_400_000
    assert SE.parse_fixed_interval("12h") == 43_200_000
    assert SE.parse_fixed_interval("30m") == 1_800_000
    assert SE.parse_fixed_interval("10s") == 10_000
    assert SE.parse_fixed_interval("500ms") == 500
    assert SE.parse_fixed_interval(3600000) == 3_600_000
    with pytest.raises(ValueError):
        SE.parse_fixed_interval("1month")  # calendar intervals refused

    out, pages = dv_index
    root = str(os.path.dirname(out))
    tsd = os.path.join(root, "idx_ts")
    if not os.path.exists(os.path.join(tsd, "stats.json")):
        pages_ts = pages.withColumn(
            "ts",
            F.timestamp_millis(
                (F.lit(1735689600000) + F.col("n_chars").cast("long") * F.lit(3600000))
            ),
        )
        _bi(spark, pages_ts, tsd, target_postings_per_salt=50,
            term_buckets=8, doc_values=["ts"])
        build_sharded_segments(spark, tsd, n_shards=3)
    eng = SearchEngine(tsd)
    want = eng.aggregate_date_histogram("ts", "1d")
    got = [
        (int(r["key"]), int(r["doc_count"]))
        for r in aggregate_date_histogram_sharded(
            spark, tsd, "ts", "1d"
        ).collect()
    ]
    assert got == want and sum(c for _, c in want) == 300
    # keys are day-floored epoch millis
    assert all(k % 86_400_000 == 0 for k, _ in want)
    assert dt.datetime.utcfromtimestamp(want[0][0] / 1000).year == 2025
