"""Distributed query path: score compressed segments inside executors.

The driver-side ``SearchEngine`` answers single queries in ~20 ms; this
path is for the cluster shape — segments too large for one node, or
query batches. Plan:

  segments parquet  (filter: term_bucket IN buckets AND term IN terms
                     -> partition pruning + row-group pruning, pushed)
    -> mapInPandas   decode blobs + BM25-score per posting (numpy),
                     emit per-partition candidate rows
    -> global top-k  orderBy(score desc, doc_id).limit(k)  — top-k is
                     associative, Spark's TakeOrdered does the merge

Doclens ship to executors as a broadcast (the norms file). At 10^12
docs the doclen array shards by doc range alongside the segments; the
broadcast stands in for that shard-local lookup in local mode.

Scoring math, summation order (sorted term), and tie-break are
identical to the driver engine and the DataFrame oracle — the parity
test holds across all three.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from job_searchengine_project_spark import BM25_B, BM25_K1
from job_searchengine_project_spark.index import codec
from job_searchengine_project_spark.index.build import _term_bucket_py


def search_distributed(
    spark: SparkSession,
    index_dir: str,
    query_terms: list[str],
    k: int = 10,
) -> DataFrame:
    """BM25 top-k over the segment table, scored executor-side.

    Returns (doc_id, score, url), rank-ordered.
    """
    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)
    n_docs = int(stats["n_docs"])
    avgdl = float(stats["avgdl"])
    term_buckets = int(stats["term_buckets"])

    terms = sorted(set(query_terms))
    buckets = sorted({_term_bucket_py(t, term_buckets) for t in terms})

    seg = (
        spark.read.parquet(os.path.join(index_dir, "segments"))
        .filter(F.col("term_bucket").isin(buckets) & F.col("term").isin(terms))
        .select("term", "df", "doc_blob", "tf_blob", "block_n",
                "block_doc_bytes", "block_tf_bytes")
    )

    # norms: doc_id -> doclen, broadcast to executors
    doclens_tbl = (
        spark.read.parquet(os.path.join(index_dir, "forward"))
        .select("doc_id", "doclen")
        .collect()
    )
    dl_arr = np.zeros(n_docs, dtype=np.float64)
    for r in doclens_tbl:
        dl_arr[r["doc_id"]] = r["doclen"]
    bc_dl = spark.sparkContext.broadcast(dl_arr)

    def score_partition(batches):
        dl = bc_dl.value
        for pdf in batches:
            if pdf.empty:
                continue
            # sorted-term order within the partition keeps per-doc
            # summation order identical to the oracle after the final agg
            pdf = pdf.sort_values("term", kind="stable")
            doc_parts, score_parts = [], []
            for r in pdf.itertuples():
                enc = codec.EncodedPostings(
                    count=int(r.df),
                    first_doc=0,
                    doc_blob=bytes(r.doc_blob),
                    tf_blob=bytes(r.tf_blob),
                    block_n=np.asarray(r.block_n, dtype=np.int32),
                    block_last_doc=np.zeros(len(r.block_n), dtype=np.int64),
                    block_doc_bytes=np.asarray(r.block_doc_bytes, dtype=np.int32),
                    block_tf_bytes=np.asarray(r.block_tf_bytes, dtype=np.int32),
                    block_max_tfnorm=np.zeros(len(r.block_n), dtype=np.float64),
                )
                docs, tfs = codec.decode_postings(enc)
                idf = float(np.log1p((n_docs - r.df + 0.5) / (r.df + 0.5)))
                dls = dl[docs]
                score_parts.append(
                    idf * (tfs / (tfs + BM25_K1 * (1.0 - BM25_B + BM25_B * dls / avgdl)))
                )
                doc_parts.append(docs)
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(doc_parts),
                    "part": np.concatenate(score_parts),
                }
            )

    partials = seg.mapInPandas(score_partition, schema="doc_id long, part double")
    scored = (
        partials.groupBy("doc_id")
        .agg(F.sum("part").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    urls = spark.read.parquet(os.path.join(index_dir, "forward")).select("doc_id", "url")
    return (
        scored.join(urls, "doc_id")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .select("doc_id", "score", "url")
    )
