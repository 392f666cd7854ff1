"""M0/M1: corpus determinism + the byte-identical extraction invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from job_searchengine_project_spark.corpus import HEAD_TERMS, generate_webpages
from job_searchengine_project_spark.functions.extract import extract_text, extract_text_py


def test_corpus_schema_and_determinism(spark, webpages_small):
    df = webpages_small
    assert [f.name for f in df.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    assert df.count() == 300
    assert df.select("url").distinct().count() == 300

    # identical regardless of partitioning (counter-based per-doc RNG)
    again = generate_webpages(spark, n_docs=300, vocab_size=500, seed=42, partitions=7)
    a = sorted(df.select("url", "text").collect())
    b = sorted(again.select("url", "text").collect())
    assert a == b


def test_head_terms_are_skewed(webpages_small):
    n = webpages_small.count()
    for ht in HEAD_TERMS:
        df_ht = webpages_small.filter(
            F.array_contains(F.split(F.col("text"), " "), ht)
        ).count()
        assert df_ht > 0.20 * n, f"head term {ht!r} df={df_ht}/{n}"


def test_extract_byte_identical_to_ground_truth(webpages_small):
    """extract(html) == text for every url — the per-row invariant."""
    out = webpages_small.withColumn("extracted", extract_text(F.col("html")))
    mismatches = out.filter(F.col("extracted") != F.col("text")).count()
    assert mismatches == 0


def test_udf_matches_pure_python_reference(webpages_small):
    """The vectorized UDF and the scalar reference extractor agree byte-wise."""
    rows = (
        webpages_small.withColumn("extracted", extract_text(F.col("html")))
        .select("html", "extracted")
        .limit(50)
        .collect()
    )
    for r in rows:
        assert extract_text_py(bytes(r["html"])) == r["extracted"]


def test_extractor_handles_entities_like_reference():
    # remove_tags does NOT decode entities; the body profile then strips
    # '&'/';' leaving the letters — reference-faithful edge behavior.
    html = b'<html><body><div id="job-body"><p>AT&amp;T data eng</p></div></body></html>'
    assert extract_text_py(html) == "ATampT data eng"
