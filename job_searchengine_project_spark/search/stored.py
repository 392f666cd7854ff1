"""Stored-field attachment for the distributed query paths.

Given a top-k hits DataFrame (doc_id, score, url), joins the stored
docstore (ES hit _source parity, reference README.md:19-38) without
scanning it: the k hit urls are known driver-side (they ARE the query
result), so the scan filters to their hash buckets (hive partition
pruning) and urls (row-group pruning inside the url-sorted buckets)
before a broadcast join against the k rows.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from job_searchengine_project_spark.index.build import _term_bucket_py


def attach_stored_fields(
    spark: SparkSession, index_dir: str, hits: DataFrame
) -> DataFrame:
    """hits (doc_id, score, url) -> same rows + stored columns.

    The hits input must be a final top-k (small); its urls are
    collected to drive partition/row-group pruning on the docstore.
    """
    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)
    if not stats.get("store_fields"):
        return hits
    n_buckets = int(stats.get("stored_buckets", 64))
    rows = hits.collect()
    if not rows:
        return hits
    urls = sorted({r["url"] for r in rows})
    buckets = sorted({_term_bucket_py(u, n_buckets) for u in urls})
    stored = (
        spark.read.parquet(os.path.join(index_dir, "stored"))
        .filter(F.col("sbucket").isin(buckets) & F.col("url").isin(urls))
        .drop("sbucket")
    )
    if "_gen" in stored.columns:
        # a REPLACED url has one stored row per version — serve the
        # newest (max generation base; ES `_id` overwrite semantics)
        from pyspark.sql import Window

        w = Window.partitionBy("url").orderBy(F.desc("_gen"))
        stored = (
            stored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_gen")
        )
    else:  # legacy docstore without generation stamps
        stored = stored.dropDuplicates(["url"])
    hits_df = spark.createDataFrame(rows, hits.schema)
    return (
        F.broadcast(hits_df)
        .join(stored, "url")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .select("doc_id", "score", "url", *[c for c in stored.columns if c != "url"])
    )
