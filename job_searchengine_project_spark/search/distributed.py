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

Norms (doc_id -> doclen) are loaded EXECUTOR-SIDE straight from the
forward index parquet (column-pruned pyarrow read, cached per worker
process) — the driver never collects or broadcasts them. The
term-merged layout inherently scores postings spanning the full doc
range, so each scoring task needs the full norms table; at 10^12 docs
the doc-range-sharded layout (index/sharded.py), whose norms live
beside each shard, is the query path — this one is for mid-size
indexes and batch scoring.

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

# per-worker-process norms cache: ONE entry per index_dir, keyed by the
# build fingerprint recorded in stats.json — a rebuild over changed
# content (same dir, even same doc count) or an incremental update
# (fingerprint gains a +updateN suffix) replaces the stale entry
# instead of serving old doclens from a reused Python worker.
_NORMS_CACHE: dict[str, tuple[str, np.ndarray]] = {}


def _load_norms_dense(index_dir: str, n_docs: int, fingerprint: str | None = None) -> np.ndarray:
    """Executor-side dense doclen array from the forward index parquet.

    Column-pruned pyarrow read of (doc_id, doclen) only — never the
    terms array. Cached per Python worker process."""
    if fingerprint is None:
        with open(os.path.join(index_dir, "stats.json")) as f:
            fingerprint = json.load(f).get("fingerprint", "")
    hit = _NORMS_CACHE.get(index_dir)
    if hit is not None and hit[0] == fingerprint:
        return hit[1]
    import pyarrow.dataset as pads

    tbl = pads.dataset(os.path.join(index_dir, "forward")).to_table(
        columns=["doc_id", "doclen"]
    )
    arr = np.zeros(n_docs, dtype=np.float64)
    arr[tbl.column("doc_id").to_numpy()] = (
        tbl.column("doclen").to_numpy().astype(np.float64)
    )
    _NORMS_CACHE[index_dir] = (fingerprint, arr)
    return arr


# each scoring task materializes a dense 8 B x n_docs doclen array;
# beyond this many docs that working set is no longer a mid-size
# index (>400 MB/worker) and the doc-range-sharded layout, whose
# norms are shard-local, is the only sane plan
MAX_DENSE_NORM_DOCS = 50_000_000


def search_distributed(
    spark: SparkSession,
    index_dir: str,
    query_terms: list[str],
    k: int = 10,
    with_fields: bool = False,
    auto_route: bool = True,
    max_dense_docs: int = MAX_DENSE_NORM_DOCS,
) -> DataFrame:
    """BM25 top-k over the segment table, scored executor-side.

    Returns (doc_id, score, url), rank-ordered.

    Routing contract: this path's working set is a dense per-worker
    doclen array, so it is ONLY for mid-size indexes. When the index
    has a doc-range-sharded layout (shards_meta.json), the call
    auto-delegates to ``search_sharded`` (identical results — parity
    tested); without one, indexes beyond ``max_dense_docs`` raise
    instead of silently building an 8 B x n_docs array per worker.
    """
    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)
    n_docs = int(stats["n_docs"])
    from job_searchengine_project_spark.index.sharded import shards_fresh

    # route only to a layout derived from the CURRENT index state —
    # stale shards (post-update/compaction) fall back to this path
    if auto_route and shards_fresh(index_dir):
        from job_searchengine_project_spark.index.sharded import search_sharded

        return search_sharded(
            spark, index_dir, query_terms, k=k, with_fields=with_fields
        )
    if n_docs > max_dense_docs:
        raise ValueError(
            f"search_distributed: {n_docs} docs exceeds the dense-norms bound "
            f"({max_dense_docs}); build the sharded layout "
            "(index.sharded.build_sharded_segments) and use search_sharded"
        )
    avgdl = float(stats["avgdl"])
    term_buckets = int(stats["term_buckets"])
    fingerprint = str(stats.get("fingerprint", ""))

    terms = sorted(set(query_terms))
    buckets = sorted({_term_bucket_py(t, term_buckets) for t in terms})

    seg = (
        spark.read.parquet(os.path.join(index_dir, "segments"))
        .filter(F.col("term_bucket").isin(buckets) & F.col("term").isin(terms))
        .select("term", "df", "doc_blob", "tf_blob", "block_n",
                "block_doc_bytes", "block_tf_bytes")
    )
    # a term updated G times has G+1 generation rows (segment stacking);
    # idf needs the GLOBAL df — a tiny agg over <= |q| x (G+1) rows
    df_map = {
        r["term"]: int(r["df"])
        for r in seg.groupBy("term").agg(F.sum("df").alias("df")).collect()
    }
    bc_df = spark.sparkContext.broadcast(df_map)
    from job_searchengine_project_spark.index.tombstone import load_tombstones

    n_eff = n_docs - int(stats.get("n_purged", 0))  # idf N (tombstone.py)
    bc_del = spark.sparkContext.broadcast(load_tombstones(index_dir))

    def score_partition(batches):
        dl = None
        for pdf in batches:
            if pdf.empty:
                continue
            if dl is None:  # lazy: empty partitions never touch the norms
                dl = _load_norms_dense(index_dir, n_docs, fingerprint)
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
                dele = bc_del.value
                if dele.size:
                    live = ~np.isin(docs, dele)
                    docs, tfs = docs[live], tfs[live]
                    if docs.size == 0:
                        continue
                g_df = bc_df.value[r.term]
                idf = float(np.log1p((n_eff - g_df + 0.5) / (g_df + 0.5)))
                dls = dl[docs]
                score_parts.append(
                    idf * (tfs / (tfs + BM25_K1 * (1.0 - BM25_B + BM25_B * dls / avgdl)))
                )
                doc_parts.append(docs)
            if doc_parts:  # every row's postings may be tombstoned
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
    from job_searchengine_project_spark.index.sharded import _attach_urls_pruned

    out = (
        _attach_urls_pruned(spark, index_dir, scored)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .select("doc_id", "score", "url")
    )
    if with_fields:
        from job_searchengine_project_spark.search.stored import attach_stored_fields

        out = attach_stored_fields(spark, index_dir, out)
    return out
