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
