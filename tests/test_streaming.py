"""Structured Streaming: checkpointed ingest (the reference's T2/T3
at-least-once + resume semantics) and the windowed agg."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_stream_ingest_checkpoint_resume(spark, webpages_small, tmp_path):
    from job_searchengine_project_spark.streaming.pipeline import stream_ingest_pages

    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    first = webpages_small.filter(F.col("url").contains("/0")).coalesce(1)
    first.write.mode("overwrite").parquet(src)
    n1 = first.count()

    q = stream_ingest_pages(spark, src, out, ckpt)
    q.awaitTermination()
    got1 = spark.read.parquet(out)
    assert got1.count() == n1

    # append a second batch of files; restart drains ONLY the new ones
    second = webpages_small.filter(~F.col("url").contains("/0")).coalesce(1)
    second.write.mode("append").parquet(src)
    q2 = stream_ingest_pages(spark, src, out, ckpt)
    q2.awaitTermination()
    got2 = spark.read.parquet(out)
    assert got2.count() == webpages_small.count()  # no duplicates: checkpointed offsets
    assert got2.select("doc_uid").distinct().count() == webpages_small.count()


def test_stream_extraction_matches_ground_truth(spark, webpages_small, tmp_path):
    from job_searchengine_project_spark.streaming.pipeline import stream_ingest_pages

    src = str(tmp_path / "pages")
    webpages_small.limit(50).coalesce(1).write.mode("overwrite").parquet(src)
    q = stream_ingest_pages(spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    q.awaitTermination()
    got = spark.read.parquet(str(tmp_path / "out"))
    truth = webpages_small.select("url", F.col("text").alias("truth"))
    mism = got.join(truth, "url").filter(F.col("text") != F.col("truth")).count()
    assert mism == 0


def test_stateful_first_seen_dedup(spark, tmp_path):
    """Keyed state across micro-batches: duplicate msgids in LATER
    batches are suppressed (the Redis SADD dedup, Spark-native)."""
    import pandas as pd

    src = str(tmp_path / "msgs")
    b1 = spark.createDataFrame(
        pd.DataFrame({"msgid": ["a", "b", "c", "a"], "v": [1, 2, 3, 4]})
    )
    b1.coalesce(1).write.mode("overwrite").parquet(src)
    b2 = spark.createDataFrame(
        pd.DataFrame({"msgid": ["b", "d", "a"], "v": [5, 6, 7]})
    )
    b2.coalesce(1).write.mode("append").parquet(src)

    from job_searchengine_project_spark.streaming.pipeline import (
        stream_first_seen_dedup,
    )

    q = stream_first_seen_dedup(
        spark, src, b1.schema, key_col="msgid", queryName="fs_test"
    )
    q.awaitTermination()
    rows = spark.sql("SELECT msgid FROM fs_test").collect()
    got = sorted(r["msgid"] for r in rows)
    # every key exactly once, regardless of batch boundaries and dups
    assert got == ["a", "b", "c", "d"]


def test_stream_live_index(spark, webpages_small, tmp_path):
    """Streaming crawl batches maintain a live searchable index:
    batch 1 builds, batch 2 (containing one replayed duplicate url)
    appends only the new docs, and the final index answers like a
    fresh engine over the union corpus."""
    import os

    from job_searchengine_project_spark.search.engine import SearchEngine
    from job_searchengine_project_spark.streaming.pipeline import stream_live_index

    pages_dir = str(tmp_path / "pages_in")
    idx = str(tmp_path / "live_idx")
    ckpt = str(tmp_path / "live_ckpt")
    a = webpages_small.limit(120)
    b = webpages_small.subtract(a).limit(80)
    a.write.mode("overwrite").parquet(pages_dir)

    q = stream_live_index(
        spark, pages_dir, idx, ckpt, target_postings_per_salt=50, term_buckets=16
    )
    q.awaitTermination()
    eng1 = SearchEngine(idx)
    assert eng1.n_docs == 120
    assert eng1.search(["spark"], k=5)

    # batch 2: 80 new docs + 1 replayed duplicate (must not double-index)
    dup = a.limit(1)
    b.unionByName(dup).write.mode("append").parquet(pages_dir)
    q2 = stream_live_index(
        spark, pages_dir, idx, ckpt, target_postings_per_salt=50, term_buckets=16
    )
    q2.awaitTermination()
    eng2 = SearchEngine(idx)
    assert eng2.n_docs == 200  # 120 + 80, duplicate dropped
    fwd = spark.read.parquet(os.path.join(idx, "forward"))
    assert fwd.select("url").distinct().count() == 200
    assert fwd.count() == 200
    # batch-2 docs are searchable
    b_urls = {r["url"] for r in b.select("url").collect()}
    hits = eng2.search(["spark"], k=200)
    assert any(h.url in b_urls for h in hits)


def test_stream_live_index_replay_after_midbuild_crash(spark, webpages_small, tmp_path):
    """A first batch that died between the docs and segments stages
    (stats.json exists, segments marker missing) must be FINISHED by
    the replay, not skipped by the url anti-join."""
    import os
    import shutil

    from job_searchengine_project_spark.index.build import build_index
    from job_searchengine_project_spark.search.engine import SearchEngine
    from job_searchengine_project_spark.streaming.pipeline import stream_live_index

    pages_dir = str(tmp_path / "pages_crash")
    idx = str(tmp_path / "crash_idx")
    ckpt = str(tmp_path / "crash_ckpt")
    batch = webpages_small.limit(100)
    batch.write.mode("overwrite").parquet(pages_dir)

    # simulate the mid-build crash state: docs stage committed,
    # segments stage not (a real crash has no segments marker, no
    # segment files AND no segments lineage rows — lineage appends
    # after each bucket-group write)
    build_index(spark, batch, idx, target_postings_per_salt=50, term_buckets=16)
    os.remove(os.path.join(idx, "_STAGE_OK_segments.json"))
    shutil.rmtree(os.path.join(idx, "segments"))
    shutil.rmtree(os.path.join(idx, "lineage"))

    q = stream_live_index(
        spark, pages_dir, idx, ckpt, target_postings_per_salt=50, term_buckets=16
    )
    q.awaitTermination()
    assert os.path.exists(os.path.join(idx, "_STAGE_OK_segments.json"))
    eng = SearchEngine(idx)
    assert eng.n_docs == 100
    assert eng.search(["spark"], k=3)  # segments exist again
