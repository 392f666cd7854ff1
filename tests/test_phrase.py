"""Positional index + match_phrase semantics (ES two_gram body_text,
schema/es/es.sh:16-29: consecutive 2-gram positions == substring)."""

from __future__ import annotations

import pytest

from job_searchengine_project_spark.index.build import build_index
from job_searchengine_project_spark.index.update import update_index
from job_searchengine_project_spark.search.engine import SearchEngine


@pytest.fixture(scope="module")
def phrase_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_phrase"))
    pages = spark.createDataFrame(
        [
            ("u0", "spark data table"),       # phrase "spark data" present
            ("u1", "data spark table"),       # both words, NOT adjacent
            ("u2", "spark and then data"),    # both words, far apart
            ("u3", "sparkle database"),       # substrings share grams only
            ("u4", "spark data spark data"),  # phrase twice
        ],
        "url string, text string",
    )
    build_index(
        spark, pages, out, analyzer="2gram",
        target_postings_per_salt=50, term_buckets=8, with_positions=True,
    )
    return out


def test_phrase_rejects_non_adjacent(spark, phrase_index):
    eng = SearchEngine(phrase_index)
    hits = eng.search_phrase("spark data", k=10)
    urls = sorted(h.url for h in hits)
    assert urls == ["u0", "u4"]
    # plain match-OR would have matched every doc sharing grams
    or_hits = eng.search_text("spark data", k=10)
    assert len(or_hits) == 5


def test_phrase_missing_term_no_match(spark, phrase_index):
    eng = SearchEngine(phrase_index)
    assert eng.search_phrase("zzqq", k=5) == []
    assert eng.search_phrase("", k=5) == []


def test_phrase_requires_positions(spark, tmp_path):
    out = str(tmp_path / "idx_nopos")
    pages = spark.createDataFrame(
        [("u0", "spark data table")], "url string, text string"
    )
    build_index(spark, pages, out, analyzer="2gram", term_buckets=8)
    with pytest.raises(ValueError, match="positions"):
        SearchEngine(out).search_phrase("spark data", k=5)


def test_phrase_survives_incremental_update(spark, phrase_index):
    """update_index must keep (and extend) the positional blobs through
    the merge-by-concatenation path."""
    batch = spark.createDataFrame(
        [("u5", "big spark data pipeline"), ("u6", "data then spark")],
        "url string, text string",
    )
    res = update_index(spark, batch, phrase_index, target_postings_per_salt=50)
    assert res["added_docs"] == 2
    eng = SearchEngine(phrase_index)
    urls = sorted(h.url for h in eng.search_phrase("spark data", k=10))
    assert urls == ["u0", "u4", "u5"]


def test_sharded_phrase_matches_driver(spark, phrase_index):
    """Distributed phrase over the positional sharded layout is rank-
    and score-identical to the driver engine's search_phrase."""
    from job_searchengine_project_spark.index.sharded import (
        build_sharded_segments,
        search_sharded_phrase,
    )

    build_sharded_segments(spark, phrase_index, n_shards=3)
    eng = SearchEngine(phrase_index)
    for q in ("spark data", "zzqq", "data table"):
        driver = eng.search_phrase(q, k=10)
        dist = search_sharded_phrase(spark, phrase_index, q, k=10).collect()
        assert [r["doc_id"] for r in dist] == [h.doc_id for h in driver], q
        assert [r["url"] for r in dist] == [h.url for h in driver], q
        for r, h in zip(dist, driver):
            assert abs(r["score"] - h.score) < 1e-9


def test_phrase_morph_analyzer(spark, tmp_path):
    """Positions work on the morph analyzer too (token-index positions:
    adjacent CONTENT tokens — stopwords/len-1 tokens are not indexed,
    so adjacency is in analyzed-token space, like ES's analyzed
    position increments)."""
    out = str(tmp_path / "idx_morph_pos")
    pages = spark.createDataFrame(
        [
            ("u0", "big spark data pipeline"),
            ("u1", "spark runs on data"),   # not adjacent in token space
            ("u2", "data spark"),           # reversed
        ],
        "url string, text string",
    )
    build_index(spark, pages, out, analyzer="morph", term_buckets=8, with_positions=True)
    eng = SearchEngine(out)
    urls = sorted(h.url for h in eng.search_phrase("spark data", k=10))
    assert urls == ["u0"]
