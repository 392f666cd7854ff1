"""Doc-range-sharded segment layout + fully distributed WAND.

The term-merged layout (index/build.py) is the compact archival
index; at 10^12 documents a single term's posting list no longer fits
one node, and query fan-out wants *document* parallelism. This module
derives the query-sharded layout from a built index:

- every term's postings split by the SAME doc ranges
  (shard = doc_id // ceil(N / n_shards)) — exactly the build's
  doc-range salting applied to all terms, so the encode kernel is
  reused verbatim and there is NO merge stage at all;
- shards are hive partitions (`shard=K/`), each holding all terms of
  its doc range — a shard is a self-contained mini-index;
- query: block-max WAND runs INSIDE each shard (mapInPandas over the
  shard's pushed-down term rows, executor-side), per-shard top-k rows
  come back, and the global answer is orderBy(score,doc_id).limit(k)
  — top-k is associative, and a doc lives in exactly one shard so
  scores never split.

Global idf uses the per-term df summed across shards (one tiny agg).
Doclens ship as a broadcast locally; on a real cluster each shard's
norms live beside its segment files.

Rank/score parity with the driver-side engine and the DataFrame
oracle is exact (same float64 math, same sorted-term summation, same
tie-break) — tested.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from job_searchengine_project_spark.index.build import (
    PARTIAL_SCHEMA,
    _encode_partition,
)

def build_sharded_segments(
    spark: SparkSession, index_dir: str, n_shards: int = 32
) -> str:
    """Derive the doc-range-sharded layout from a built index dir."""
    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)
    n_docs = int(stats["n_docs"])
    avgdl = float(stats["avgdl"])
    block_size = int(stats["block_size"])
    rng = max(1, -(-n_docs // n_shards))  # ceil

    fwd = spark.read.parquet(os.path.join(index_dir, "forward"))
    postings = fwd.select(
        "doc_id", "doclen", F.explode("terms").alias("t")
    ).select(
        F.col("t.term").alias("term"),
        "doc_id",
        F.col("t.tf").alias("tf"),
        "doclen",
        (F.col("doc_id") / F.lit(rng)).cast("int").alias("salt"),  # = shard
    )
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    shards = postings.repartition(shuffle_n, "term", "salt").mapInPandas(
        lambda it: _encode_partition(it, avgdl=avgdl, block_size=block_size),
        schema=PARTIAL_SCHEMA,
    ).withColumnRenamed("salt", "shard")
    out = os.path.join(index_dir, "shards")
    (
        shards.repartition("shard")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out)
    )
    return out


def search_sharded(
    spark: SparkSession,
    index_dir: str,
    query_terms: list[str],
    k: int = 10,
) -> DataFrame:
    """Distributed block-max WAND: per-shard top-k in executors,
    associative global merge. Returns (doc_id, score, url) ranked."""
    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)
    n_docs = int(stats["n_docs"])
    avgdl = float(stats["avgdl"])
    k1, b = float(stats["k1"]), float(stats["b"])

    terms = sorted(set(query_terms))
    seg = (
        spark.read.parquet(os.path.join(index_dir, "shards"))
        .filter(F.col("term").isin(terms))
    )
    # global df per query term (tiny agg over <= |q| x n_shards rows)
    df_map = {
        r["term"]: int(r["df"])
        for r in seg.groupBy("term").agg(F.sum("df").alias("df")).collect()
    }
    if not df_map:
        return spark.createDataFrame([], "doc_id long, score double, url string")

    doclens_rows = (
        spark.read.parquet(os.path.join(index_dir, "forward"))
        .select("doc_id", "doclen")
        .collect()
    )
    dl_arr = np.zeros(n_docs, dtype=np.float64)
    for r in doclens_rows:
        dl_arr[r["doc_id"]] = r["doclen"]
    bc_dl = spark.sparkContext.broadcast(dl_arr)
    bc_df = spark.sparkContext.broadcast(df_map)

    def shard_topk(batches):
        from job_searchengine_project_spark.index import codec
        from job_searchengine_project_spark.search.wand import TermCursor, wand_topk

        parts = list(batches)
        if not parts:
            return
        pdf_all = pd.concat(parts, ignore_index=True)
        if pdf_all.empty:
            return
        for pdf in (pdf_all,):
            dl = bc_dl.value
            dfm = bc_df.value
            for _, grp in pdf.groupby("shard", sort=False):
                cursors = []
                for r in grp.itertuples():
                    enc = codec.EncodedPostings(
                        count=int(r.df),
                        first_doc=int(r.first_doc),
                        doc_blob=bytes(r.doc_blob),
                        tf_blob=bytes(r.tf_blob),
                        block_n=np.asarray(r.block_n, dtype=np.int32),
                        block_last_doc=np.asarray(r.block_last_doc, dtype=np.int64),
                        block_doc_bytes=np.asarray(r.block_doc_bytes, dtype=np.int32),
                        block_tf_bytes=np.asarray(r.block_tf_bytes, dtype=np.int32),
                        block_max_tfnorm=np.asarray(r.block_max_tfnorm, dtype=np.float64),
                    )
                    idf = float(np.log1p((n_docs - dfm[r.term] + 0.5) / (dfm[r.term] + 0.5)))
                    cursors.append(TermCursor(term=r.term, enc=enc, idf=idf))
                hits = wand_topk(cursors, dl, avgdl, k, k1=k1, b=b)
                if hits:
                    docs_out, scores_out = zip(*hits)
                    yield pd.DataFrame({"doc_id": docs_out, "score": scores_out})

    partials = seg.mapInPandas(shard_topk, schema="doc_id long, score double")
    top = partials.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    urls = spark.read.parquet(os.path.join(index_dir, "forward")).select("doc_id", "url")
    return (
        top.join(urls, "doc_id")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .select("doc_id", "score", "url")
    )
