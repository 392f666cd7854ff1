"""Segment compaction: fold update generations, re-encode fragmented terms.

Each ``update_index`` APPENDS a generation row per touched term
(segment stacking — that is what makes updates O(batch)), so after G
updates a term has up to G+1 rows, each with its own possibly
underfilled trailing block: readers concatenate more parts, block
metadata grows, block-max bounds lose selectivity, and WAND's deep
skips shorten. Lucene solves this with background segment merges;
this is the batch equivalent.

Trigger: a term is fragmented when it has more than one generation
row OR more total blocks than a fresh encode of its total df
(``ceil(df / block_size)``). Compaction concatenates the term's
generations (doc-range-disjoint, ordered by first_doc), decodes the
postings (and positions, when the index is positional), recomputes
the per-posting BM25 tf-norms from the stored doclens and the index's
FROZEN avgdl — bit-identical to what the original encode computed —
and re-encodes ONE row at full block fill. Scores are therefore
unchanged; only the layout improves.

Only buckets containing fragmented terms are rewritten (dynamic
partition overwrite); intact rows of those buckets pass through
untouched.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from job_searchengine_project_spark import BM25_B, BM25_K1
from job_searchengine_project_spark.index import codec
from job_searchengine_project_spark.index.build import (
    SEGMENT_SCHEMA,
    SEGMENT_SCHEMA_POS,
    _enc_to_row,
)
from job_searchengine_project_spark.search.distributed import _load_norms_dense


def _enc_from_tuple(r) -> codec.EncodedPostings:
    return codec.EncodedPostings(
        count=int(r.df),
        first_doc=int(r.first_doc),
        doc_blob=bytes(r.doc_blob),
        tf_blob=bytes(r.tf_blob),
        block_n=np.asarray(r.block_n, dtype=np.int32),
        block_last_doc=np.asarray(r.block_last_doc, dtype=np.int64),
        block_doc_bytes=np.asarray(r.block_doc_bytes, dtype=np.int32),
        block_tf_bytes=np.asarray(r.block_tf_bytes, dtype=np.int32),
        block_max_tfnorm=np.asarray(r.block_max_tfnorm, dtype=np.float64),
        pos_blob=bytes(getattr(r, "pos_blob", b"") or b""),
        block_pos_bytes=(
            np.asarray(r.block_pos_bytes, dtype=np.int32)
            if getattr(r, "block_pos_bytes", None) is not None
            and len(r.block_pos_bytes)
            else None
        ),
    )


def _compact_partition(batches, *, block_size: int, avgdl: float,
                       index_dir: str, n_docs: int, with_pos: bool,
                       fingerprint: str = ""):
    dl = None
    for pdf in batches:
        if pdf.empty:
            continue
        rows = []
        # fold generations: a term's rows (all colocated — input is
        # repartitioned by term) merge ordered by first_doc
        pdf = pdf.sort_values(["term", "first_doc"], kind="stable")
        for term, grp in pdf.groupby("term", sort=False):
            tuples = list(grp.itertuples())
            df_tot = sum(int(r.df) for r in tuples)
            n_blocks = sum(len(r.block_n) for r in tuples)
            ideal = -(-df_tot // block_size)  # ceil
            if len(tuples) > 1 or n_blocks > ideal:
                if dl is None:
                    dl = _load_norms_dense(index_dir, n_docs, fingerprint or None)
                enc_in = (
                    _enc_from_tuple(tuples[0])
                    if len(tuples) == 1
                    else codec.concat_encoded([_enc_from_tuple(r) for r in tuples])
                )
                docs, tfs = codec.decode_postings(enc_in)
                pos = (
                    codec.decode_positions(enc_in, tfs)
                    if enc_in.has_positions
                    else None
                )
                tff = tfs.astype(np.float64)
                tfn = tff / (
                    tff + BM25_K1 * (1.0 - BM25_B + BM25_B * (dl[docs] / avgdl))
                )
                enc = codec.encode_postings(
                    docs, tfs, tfn, block_size=block_size, positions=pos
                )
                row = _enc_to_row(str(term), enc, 1, with_pos=with_pos)
            else:
                r = tuples[0]
                row = {
                    "term": str(term), "df": int(r.df), "first_doc": int(r.first_doc),
                    "doc_blob": bytes(r.doc_blob), "tf_blob": bytes(r.tf_blob),
                    "block_n": list(r.block_n),
                    "block_last_doc": list(r.block_last_doc),
                    "block_doc_bytes": list(r.block_doc_bytes),
                    "block_tf_bytes": list(r.block_tf_bytes),
                    "block_max_tfnorm": list(r.block_max_tfnorm),
                    "n_parts": int(r.n_parts),
                    "bytes_written": int(r.bytes_written),
                }
                if with_pos:
                    row["pos_blob"] = bytes(getattr(r, "pos_blob", b"") or b"")
                    row["block_pos_bytes"] = list(
                        getattr(r, "block_pos_bytes", []) or []
                    )
            row["term_bucket"] = int(tuples[0].term_bucket)
            rows.append(row)
        yield pd.DataFrame(rows)


def compact_index(spark: SparkSession, out_dir: str) -> dict:
    """Re-encode every fragmented term; returns
    {compacted_terms, touched_buckets}."""
    with open(os.path.join(out_dir, "stats.json")) as f:
        stats = json.load(f)
    block_size = int(stats["block_size"])
    avgdl = float(stats["avgdl"])
    n_docs = int(stats["n_docs"])
    segments_dir = os.path.join(out_dir, "segments")

    seg = spark.read.parquet(segments_dir)
    # a term needs compaction when it has >1 generation row (segment
    # stacking appends one row per update) or its total block count
    # exceeds a fresh full-fill encode
    per_term = seg.groupBy("term_bucket", "term").agg(
        F.count("*").alias("nrows"),
        F.sum(F.size("block_n")).alias("nblocks"),
        F.sum("df").alias("df_tot"),
    )
    frag = (F.col("nrows") > 1) | (
        F.col("nblocks") > F.ceil(F.col("df_tot") / F.lit(block_size)).cast("int")
    )
    frag_rows = per_term.filter(frag).select("term_bucket").groupBy("term_bucket").agg(
        F.count("*").alias("n")
    ).collect()
    touched = sorted(int(r["term_bucket"]) for r in frag_rows)
    n_frag = int(sum(r["n"] for r in frag_rows))
    if not touched:
        return {"compacted_terms": 0, "touched_buckets": 0}

    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    bucket_rows = seg.filter(F.col("term_bucket").isin(touched))
    with_pos = bool(stats.get("positions"))
    compacted = bucket_rows.repartition(shuffle_n, "term").mapInPandas(
        lambda it: _compact_partition(
            it, block_size=block_size, avgdl=avgdl,
            index_dir=out_dir, n_docs=n_docs, with_pos=with_pos,
            fingerprint=str(stats.get("fingerprint", "")),
        ),
        schema=SEGMENT_SCHEMA_POS if with_pos else SEGMENT_SCHEMA,
    )
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            compacted.repartition("term_bucket")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("term_bucket")
            .parquet(segments_dir)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    return {"compacted_terms": int(n_frag), "touched_buckets": len(touched)}
