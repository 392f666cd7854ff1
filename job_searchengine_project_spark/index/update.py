"""Incremental index update: append new documents to a built index.

The reference ingests continuously (new postings discovered per crawl
cycle); its ES `_id=msgid` upserts make re-index idempotent. Here the
equivalent is a batch append:

- new docs get dense ids continuing after the existing corpus
  (doc-range disjointness is what makes the merge a concatenation —
  every block leads with an absolute doc id, codec.concat_encoded);
- new postings are encoded with the SAME frozen ``avgdl`` as the
  initial build (the Lucene-norms trade: stored per-posting tf-norms
  are not retroactively recomputed; scores stay exact w.r.t. the
  index's recorded stats, and the oracle parity gate passes the same
  frozen stats). Query-time idf uses the UPDATED doc count;
- only term_buckets containing new terms are rewritten (dynamic
  partition overwrite), merged term-by-term with the existing rows via
  the same partition-wise merge kernel;
- forward/docstore rows append; stats + lineage record the update.

Caller contract: new pages' urls are not already indexed (dedup
upstream — J1; the reference guarantees this with the msgid set).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from job_searchengine_project_spark.index.build import (
    PARTIAL_SCHEMA,
    PARTIAL_SCHEMA_POS,
    SEGMENT_SCHEMA,
    SEGMENT_SCHEMA_POS,
    _append_lineage,
    _encode_partition,
    _merge_partition,
    _write_stats_dict,
)
from job_searchengine_project_spark.index.prepare import prepare_docs


def _purge_orphan_forward(forward_dir: str, n_docs: int) -> int:
    """Crash recovery: a prior update that appended forward files but
    died before committing stats leaves rows with doc_id >= the
    recorded n_docs. Those ids WOULD be re-assigned to the next batch
    (two urls per doc_id — silent score corruption), so delete them.
    Appends create whole new files whose every row is >= that update's
    base id, so file-level min(doc_id) >= n_docs identifies orphan
    files exactly."""
    import pyarrow.parquet as pq

    purged = 0
    for f in os.listdir(forward_dir):
        if not f.endswith(".parquet"):
            continue
        path = os.path.join(forward_dir, f)
        md = pq.read_metadata(path)
        if "doc_id" not in md.schema.names:
            return 0  # unexpected layout: do nothing
        idx = md.schema.names.index("doc_id")
        mins = []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return 0  # no stats: refuse to guess
            mins.append(st.min)
        if mins and min(mins) >= n_docs:
            os.remove(path)
            purged += 1
    return purged


def update_index(
    spark: SparkSession,
    new_pages: DataFrame,
    out_dir: str,
    target_postings_per_salt: int = 200_000,
) -> dict:
    stats_path = os.path.join(out_dir, "stats.json")
    with open(stats_path) as f:
        stats = json.load(f)
    n_old = int(stats["n_docs"])
    avgdl = float(stats["avgdl"])  # frozen (see module docstring)
    analyzer = stats["analyzer"]
    block_size = int(stats["block_size"])
    term_buckets = int(stats["term_buckets"])

    forward_dir = os.path.join(out_dir, "forward")
    segments_dir = os.path.join(out_dir, "segments")
    with_pos = bool(stats.get("positions"))
    partial_schema = PARTIAL_SCHEMA_POS if with_pos else PARTIAL_SCHEMA
    segment_schema = SEGMENT_SCHEMA_POS if with_pos else SEGMENT_SCHEMA

    # --- crash recovery + empty-batch guard --------------------------------
    # purge forward files orphaned by a previously crashed update (rows
    # with doc_id >= the committed n_docs would collide with this
    # batch's id range); the empty-batch check runs BEFORE any append
    # so an empty batch is a no-op, not a crash after a side effect
    _purge_orphan_forward(forward_dir, n_old)
    if not new_pages.limit(1).count():
        return {"added_docs": 0, "touched_buckets": 0}
    use_extractor = bool(stats.get("use_extractor"))
    docs_new = prepare_docs(
        new_pages, analyzer=analyzer, use_extractor=use_extractor,
        with_positions=bool(stats.get("positions")),
    ).withColumn("doc_id", F.col("doc_id") + F.lit(n_old))
    docs_new.write.mode("append").parquet(forward_dir)
    if stats.get("store_fields"):
        from job_searchengine_project_spark.index.build import _write_stored_fields

        _write_stored_fields(
            new_pages, os.path.join(out_dir, "stored"),
            use_extractor=use_extractor,
            stored_buckets=int(stats.get("stored_buckets", 64)),
            mode="append",
        )
    fwd_new = spark.read.parquet(forward_dir).filter(F.col("doc_id") >= n_old)
    agg = fwd_new.agg(
        F.count("*").alias("m"), F.sum("doclen").alias("tok")
    ).collect()[0]
    m, new_tokens = int(agg["m"]), int(agg["tok"] or 0)

    # --- encode new postings (frozen avgdl) -------------------------------
    term_fields = [f.name for f in fwd_new.schema["terms"].dataType.elementType.fields]
    postings = fwd_new.select(
        "doc_id", "doclen", F.explode("terms").alias("t")
    ).select(
        F.col("t.term").alias("term"), "doc_id", F.col("t.tf").alias("tf"), "doclen",
        *([F.col("t.pos").alias("pos")] if "pos" in term_fields else []),
    )
    frac = min(1.0, 100_000 / max(m, 1))
    sampled = fwd_new.sample(fraction=frac, seed=42) if frac < 1.0 else fwd_new
    df_est = (
        sampled.select(F.explode("terms").alias("t"))
        .groupBy(F.col("t.term").alias("term"))
        .agg((F.count("*") / F.lit(frac)).alias("df_est"))
    )
    head = df_est.filter(F.col("df_est") > target_postings_per_salt).select(
        "term",
        F.ceil(F.col("df_est") / target_postings_per_salt).cast("int").alias("n_salts"),
    )
    range_per_salt = F.ceil(F.lit(m) / F.col("n_salts"))
    salted = (
        postings.join(F.broadcast(head), "term", "left")
        .withColumn("n_salts", F.coalesce(F.col("n_salts"), F.lit(1)))
        .withColumn(
            "salt",
            F.when(F.col("n_salts") == 1, F.lit(0)).otherwise(
                ((F.col("doc_id") - n_old) / range_per_salt).cast("int")
            ),
        )
        .drop("n_salts")
    )
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    new_partials = salted.repartition(shuffle_n, "term", "salt").mapInPandas(
        lambda it: _encode_partition(it, avgdl=avgdl, block_size=block_size),
        schema=partial_schema,
    )
    # pre-merge the new batch per term so bucket detection sees one row
    # per term, then re-expose as a "partial" (salt=1) for the big merge
    new_segments = new_partials.repartition(shuffle_n, "term").mapInPandas(
        lambda it: _merge_partition(it, term_buckets=term_buckets),
        schema=segment_schema,
    ).cache()
    touched = sorted(
        r["term_bucket"]
        for r in new_segments.select("term_bucket").distinct().collect()
    )
    if not touched:
        new_segments.unpersist()
        return {"added_docs": m, "touched_buckets": 0}

    # --- merge: existing rows of touched buckets + the new rows -----------
    def as_partial(df: DataFrame, salt: int) -> DataFrame:
        cols = [
            "term", F.lit(salt).alias("salt"), "df", "first_doc", "doc_blob",
            "tf_blob", "block_n", "block_last_doc", "block_doc_bytes",
            "block_tf_bytes", "block_max_tfnorm", "n_parts", "bytes_written",
        ]
        if with_pos:
            # coalesced so a pre-positions bucket read through the
            # positional schema (NULL columns) still merges
            cols += [
                F.coalesce(F.col("pos_blob"), F.lit(b"")).alias("pos_blob")
                if "pos_blob" in df.columns
                else F.lit(b"").alias("pos_blob"),
                F.coalesce(
                    F.col("block_pos_bytes"), F.array().cast("array<int>")
                ).alias("block_pos_bytes")
                if "block_pos_bytes" in df.columns
                else F.array().cast("array<int>").alias("block_pos_bytes"),
            ]
        return df.select(*cols)

    existing = spark.read.parquet(segments_dir).filter(
        F.col("term_bucket").isin(touched)
    )
    combined = as_partial(existing, 0).unionByName(as_partial(new_segments, 1))
    merged = combined.repartition(shuffle_n, "term").mapInPandas(
        lambda it: _merge_partition(it, term_buckets=term_buckets),
        schema=segment_schema,
    )
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.repartition("term_bucket")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("term_bucket")
            .parquet(segments_dir)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    new_segments.unpersist()

    # --- stats + lineage ----------------------------------------------------
    _write_stats_dict(
        stats_path,
        n_docs=n_old + m,
        avgdl=avgdl,  # frozen; recorded as-is so oracle uses the same value
        total_tokens=int(stats["total_tokens"]) + new_tokens,
        analyzer=analyzer,
        block_size=block_size,
        term_buckets=term_buckets,
        fingerprint=stats["fingerprint"] + f"+update{m}",
        store_fields=stats.get("store_fields", False),
        stored_buckets=stats.get("stored_buckets", 64),
        positions=stats.get("positions", False),
        use_extractor=use_extractor,
    )
    _append_lineage(
        spark,
        os.path.join(out_dir, "lineage"),
        stage="update",
        build_fp=stats["fingerprint"] + f"+update{m}",
        rows=[
            {"partition_id": int(b), "doc_count": int(m), "term_count": 0,
             "bytes_written": 0}
            for b in touched
        ],
    )
    return {"added_docs": m, "touched_buckets": len(touched)}
