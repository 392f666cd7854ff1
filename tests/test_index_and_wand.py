"""M3/M4: segment build (salted skew split, lineage, resume) + WAND parity."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from job_searchengine_project_spark.corpus import HEAD_TERMS
from job_searchengine_project_spark.index.build import build_index
from job_searchengine_project_spark.index.prepare import prepare_docs
from job_searchengine_project_spark.search.bm25 import bm25_topk_oracle
from job_searchengine_project_spark.search.engine import SearchEngine

QUERIES = [
    ["데이터엔지니어"],            # head term (reference README body search)
    ["spark"],
    ["spark", "데이터엔지니어", "개발자"],   # multi-term OR over head terms
    ["spark", "zzz_absent_term"],
    ["zzz_absent_term"],
]


@pytest.fixture(scope="module")
def index_dir(spark, webpages_small, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx"))
    # tiny salt target so the head terms exercise the skew-split path
    res = build_index(
        spark, webpages_small, out, target_postings_per_salt=50, term_buckets=16
    )
    assert res.n_docs == 300
    assert res.stages_run == ["docs", "segments"]
    return out


@pytest.fixture(scope="module")
def engine(index_dir):
    return SearchEngine(index_dir)


@pytest.fixture(scope="module")
def docs(webpages_small):
    d = prepare_docs(webpages_small).cache()
    d.count()
    return d


def test_head_terms_were_salt_split(spark, index_dir):
    seg = spark.read.parquet(os.path.join(index_dir, "segments"))
    heads = seg.filter(F.col("term").isin(list(HEAD_TERMS))).select("term", "n_parts", "df").collect()
    assert len(heads) == len(HEAD_TERMS)
    for r in heads:
        assert r["n_parts"] > 1, f"head term {r['term']} was not split (df={r['df']})"


def test_segments_reconcile_with_corpus(spark, index_dir, docs):
    """Sum of df over terms == total postings == sum of per-doc distinct terms."""
    seg = spark.read.parquet(os.path.join(index_dir, "segments"))
    total_df = seg.agg(F.sum("df")).collect()[0][0]
    expected = docs.select(F.sum(F.size("terms"))).collect()[0][0]
    assert total_df == expected


def test_lineage_doc_count_invariant(spark, index_dir):
    """Reference reconciliation: sum of lineage doc counts == corpus count."""
    lin = spark.read.parquet(os.path.join(index_dir, "lineage"))
    docs_stage = lin.filter(F.col("stage") == "docs")
    assert docs_stage.agg(F.sum("doc_count")).collect()[0][0] == 300
    assert docs_stage.filter(~F.col("completed")).count() == 0


def test_wand_matches_engine_bruteforce(engine):
    for q in QUERIES:
        for strategy in ("wand", "exhaustive", "auto"):
            got = engine.search(q, k=10, with_urls=False, strategy=strategy)
            brute = engine.search_bruteforce(q, k=10)
            assert [h.doc_id for h in got] == [h.doc_id for h in brute], (q, strategy)
            for a, b in zip(got, brute):
                assert abs(a.score - b.score) < 1e-9, (q, strategy)


def test_wand_matches_dataframe_oracle(engine, docs):
    """The headline parity gate: compressed-segment WAND == built-in-Spark oracle."""
    for q in QUERIES:
        wand = engine.search(q, k=10, with_urls=True)
        oracle = bm25_topk_oracle(
            docs, q, k=10, n_docs=engine.n_docs, avgdl=engine.avgdl
        ).collect()
        assert [h.doc_id for h in wand] == [r["doc_id"] for r in oracle], q
        assert [h.url for h in wand] == [r["url"] for r in oracle], q
        for h, r in zip(wand, oracle):
            assert abs(h.score - r["score"]) < 1e-9, q


def test_wand_k_edge_cases(engine):
    assert engine.search(["spark"], k=0) == []
    all_hits = engine.search(["spark"], k=10**6, with_urls=False)
    brute = engine.search_bruteforce(["spark"], k=10**6)
    assert len(all_hits) == len(brute)
    assert engine.search(["zzz_absent_term"], k=5) == []


def test_resume_skips_completed_stages(spark, webpages_small, index_dir):
    res2 = build_index(
        spark, webpages_small, index_dir,
        target_postings_per_salt=50, term_buckets=16, resume=True,
    )
    assert res2.stages_skipped == ["docs", "segments"]
    assert res2.stages_run == []


def test_resume_rebuilds_after_kill(spark, webpages_small, index_dir, engine):
    """Kill-after-docs: drop the segments marker, resume rebuilds only segments."""
    q = ["spark", "데이터엔지니어"]
    # a SearchEngine is a snapshot reader — capture results BEFORE the
    # rebuild replaces the files under it
    before = [(h.doc_id, round(h.score, 12)) for h in engine.search(q, k=10)]
    os.remove(os.path.join(index_dir, "_STAGE_OK_segments.json"))
    res = build_index(
        spark, webpages_small, index_dir,
        target_postings_per_salt=50, term_buckets=16, resume=True,
    )
    assert res.stages_skipped == ["docs"]
    assert res.stages_run == ["segments"]
    # rebuilt segments answer identically
    eng2 = SearchEngine(index_dir)
    assert [(h.doc_id, round(h.score, 12)) for h in eng2.search(q, k=10)] == before


def test_fingerprint_invalidates_on_input_change(spark, webpages_small, index_dir):
    changed = webpages_small.limit(200)
    res = build_index(
        spark, changed, index_dir,
        target_postings_per_salt=50, term_buckets=16, resume=True,
    )
    assert res.stages_run == ["docs", "segments"]
    assert res.n_docs == 200


def test_bucket_level_resume_after_midbuild_kill(spark, webpages_small, tmp_path):
    """Kill BETWEEN checkpoint groups: committed buckets survive, the
    resume rebuilds only the missing ones, and the final index answers
    identically to a clean one-shot build."""
    import pytest as _pytest

    out = str(tmp_path / "idx_kill")
    with _pytest.raises(RuntimeError, match="injected kill"):
        build_index(
            spark, webpages_small, out,
            target_postings_per_salt=50, term_buckets=16,
            checkpoint_groups=4, _fail_after_groups=2,
        )
    lin = spark.read.parquet(os.path.join(out, "lineage"))
    committed = lin.filter(F.col("stage") == "segments").count()
    assert 0 < committed < 16  # partial progress is durable
    assert not os.path.exists(os.path.join(out, "_STAGE_OK_segments.json"))

    res = build_index(
        spark, webpages_small, out,
        target_postings_per_salt=50, term_buckets=16,
        checkpoint_groups=4, resume=True,
    )
    assert res.stages_skipped == ["docs"]
    # only the NOT-yet-committed buckets were rebuilt in the resume:
    # lineage now covers each of the 16 buckets exactly once
    lin2 = spark.read.parquet(os.path.join(out, "lineage")).filter(
        F.col("stage") == "segments"
    )
    per_bucket = {r["partition_id"]: r["doc_count"] for r in lin2.collect()}
    assert len(per_bucket) == 16 and lin2.count() == 16

    # parity with a clean build
    clean = str(tmp_path / "idx_clean")
    res_clean = build_index(
        spark, webpages_small, clean,
        target_postings_per_salt=50, term_buckets=16,
    )
    e1, e2 = SearchEngine(out), SearchEngine(clean)
    assert e1.n_docs == e2.n_docs and e1.stats["fingerprint"] == e2.stats["fingerprint"]
    for q in (["spark"], ["데이터엔지니어", "개발자"]):
        h1 = [(h.doc_id, round(h.score, 12)) for h in e1.search(q, k=10, with_urls=False)]
        h2 = [(h.doc_id, round(h.score, 12)) for h in e2.search(q, k=10, with_urls=False)]
        assert h1 == h2
    # reconciliation: lineage postings total == clean build total
    assert sum(per_bucket.values()) == res_clean.total_postings


def test_build_is_bit_deterministic(spark, webpages_small, tmp_path):
    """Two independent builds of the same input produce byte-identical
    posting blobs per term — the whole-pipeline determinism guarantee
    (content-derived ids, deterministic salts, stable kernels)."""
    outs = []
    for name in ("d1", "d2"):
        out = str(tmp_path / name)
        build_index(spark, webpages_small, out,
                    target_postings_per_salt=50, term_buckets=16)
        outs.append(out)
    a = {
        r["term"]: (bytes(r["doc_blob"]).hex(), bytes(r["tf_blob"]).hex(), r["df"])
        for r in spark.read.parquet(f"{outs[0]}/segments").collect()
    }
    b = {
        r["term"]: (bytes(r["doc_blob"]).hex(), bytes(r["tf_blob"]).hex(), r["df"])
        for r in spark.read.parquet(f"{outs[1]}/segments").collect()
    }
    assert a == b


def test_resume_invalidates_on_content_change(spark, webpages_small, tmp_path):
    """Same urls, changed text: the fingerprint hashes content, so
    resume=True must rebuild both stages instead of serving the stale
    index (the resume contract is deterministic-build, not same-urls)."""
    out = str(tmp_path / "idx_content")
    build_index(spark, webpages_small, out, target_postings_per_salt=50, term_buckets=16)
    changed = webpages_small.withColumn(
        "text", F.concat(F.col("text"), F.lit(" zzzinjectedterm"))
    )
    res = build_index(
        spark, changed, out,
        target_postings_per_salt=50, term_buckets=16, resume=True,
    )
    assert res.stages_run == ["docs", "segments"]
    assert res.stages_skipped == []
    eng = SearchEngine(out)
    hits = eng.search(["zzzinjectedterm"], k=5)
    assert hits  # the new content is queryable


def test_rebuild_same_dir_totals_stable(spark, webpages_small, tmp_path):
    """A second non-resume build into the same out_dir appends lineage
    rows; the stage-commit totals must dedupe per bucket, not double."""
    out = str(tmp_path / "idx_twice")
    r1 = build_index(spark, webpages_small, out, target_postings_per_salt=50, term_buckets=16)
    r2 = build_index(spark, webpages_small, out, target_postings_per_salt=50, term_buckets=16)
    assert (r2.n_terms, r2.total_postings) == (r1.n_terms, r1.total_postings)


def test_exhaustive_tie_break_at_k_boundary(spark, tmp_path):
    """Duplicate texts produce bitwise-equal scores; the exhaustive
    kernel must apply the asc-doc_id tie-break at the k-boundary
    exactly like WAND and the brute-force oracle."""
    out = str(tmp_path / "idx_ties")
    pages = spark.createDataFrame(
        [(f"https://t.test/{i}", "alpha beta gamma") for i in range(6)]
        + [(f"https://t.test/x{i}", "delta epsilon") for i in range(3)],
        "url string, text string",
    )
    build_index(spark, pages, out, target_postings_per_salt=50, term_buckets=8)
    eng = SearchEngine(out)
    for k in (1, 3, 5, 6):
        ex = eng.search(["alpha"], k=k, strategy="exhaustive")
        wd = eng.search(["alpha"], k=k, strategy="wand")
        bf = eng.search_bruteforce(["alpha"], k=k)
        assert [(h.doc_id, h.score) for h in ex] == [(h.doc_id, h.score) for h in wd]
        assert [(h.doc_id, h.score) for h in ex] == [(h.doc_id, h.score) for h in bf]
        # all six tie -> the k LOWEST doc_ids win
        tied_ids = sorted(h.doc_id for h in eng.search(["alpha"], k=6, strategy="wand"))
        assert [h.doc_id for h in ex] == tied_ids[:k]


@pytest.fixture(scope="module")
def stored_index(spark, webpages_small, tmp_path_factory):
    # fresh dir: earlier tests in this module rebuild index_dir in place
    out = str(tmp_path_factory.mktemp("idx_stored"))
    build_index(spark, webpages_small, out, target_postings_per_salt=50, term_buckets=16)
    return out


def test_stored_field_hits(spark, webpages_small, stored_index):
    """ES hit payload parity (README.md:19-38): hits carry the full
    stored document, not just url — body text byte-identical to the
    input, plus the other page columns."""
    hits = SearchEngine(stored_index).search(["spark"], k=5, with_fields=True)
    assert hits
    src = {r["url"]: r for r in webpages_small.collect()}
    for h in hits:
        assert h.fields is not None
        assert h.fields["url"] == h.url
        assert h.fields["body"] == src[h.url]["text"]
        assert h.fields["lang"] == src[h.url]["lang"]


def test_stored_fields_distributed(spark, webpages_small, stored_index):
    from job_searchengine_project_spark.search.distributed import search_distributed

    rows = search_distributed(spark, stored_index, ["spark"], k=5, with_fields=True).collect()
    assert rows
    src = {r["url"]: r["text"] for r in webpages_small.collect()}
    plain = search_distributed(spark, stored_index, ["spark"], k=5).collect()
    assert [(r["doc_id"], r["score"]) for r in rows] == [
        (r["doc_id"], r["score"]) for r in plain
    ]
    for r in rows:
        assert r["body"] == src[r["url"]]
