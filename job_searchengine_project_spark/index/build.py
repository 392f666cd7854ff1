"""Index build: pages -> compressed block-max segments, resumable.

Physical plan (one lineage-tracked batch DAG — the Spark collapse of
the reference's six daemons, SURVEY.md §3.2):

    pages
      -> prepare_docs           (Arrow UDF tokenize; tf computed in-UDF
                                 = map-side partial aggregation)
      -> write docstore+forward (stage "docs", resumable checkpoint)
      -> explode to postings    (term, doc_id, tf, doclen)
      -> df-per-term agg        (map-side combined; head-term detection)
      -> salt assignment        explicit skew split: head terms with
                                df > target get n_salts doc-RANGE
                                partitions (salt = doc_id // range) so
                                partial segments are doc-disjoint
      -> repartition(term,salt) -> applyInPandas encode (numpy codec)
      -> groupBy(term)          merge partials by blob CONCATENATION
                                (only compressed bytes shuffle here —
                                the whole point of salting first)
      -> write segments parquet partitioned by term_bucket
         (+ stats, + per-partition lineage metrics)

Skew rationale: Zipfian head terms would otherwise send >20% of all
posting rows through single reducers (north_rule: skew handled
explicitly). The salt phase encodes/compresses inside the salt
partition, so a head term's merge input is ~n_salts compressed blobs,
not df raw rows.

Resume contract (reference spine: the txid lineage table,
psql_create.psql:8-17): each stage commits an atomic `_STAGE_OK.json`
marker carrying a deterministic build fingerprint; `build_index(...,
resume=True)` skips stages whose marker matches the fingerprint —
kill the job anywhere and a rerun does only the remaining stages.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from job_searchengine_project_spark import BM25_B, BM25_K1
from job_searchengine_project_spark.index import codec
from job_searchengine_project_spark.index.prepare import prepare_docs

SEGMENT_SCHEMA = (
    "term string, term_bucket int, df long, first_doc long, "
    "doc_blob binary, tf_blob binary, "
    "block_n array<int>, block_last_doc array<long>, "
    "block_doc_bytes array<int>, block_tf_bytes array<int>, "
    "block_max_tfnorm array<double>, n_parts int, bytes_written long"
)

PARTIAL_SCHEMA = SEGMENT_SCHEMA.replace(
    "term string, term_bucket int,", "term string, salt int,"
)


@dataclass
class BuildResult:
    out_dir: str
    n_docs: int
    avgdl: float
    n_terms: int
    total_postings: int
    stages_run: list[str]
    stages_skipped: list[str]


def _marker_path(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, f"_STAGE_OK_{stage}.json")


def _stage_done(out_dir: str, stage: str, fingerprint: str) -> bool:
    p = _marker_path(out_dir, stage)
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            return json.load(f).get("fingerprint") == fingerprint
    except (json.JSONDecodeError, OSError):
        return False


def _commit_stage(out_dir: str, stage: str, fingerprint: str, **metrics) -> None:
    tmp = _marker_path(out_dir, stage) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"stage": stage, "fingerprint": fingerprint, **metrics}, f)
    os.replace(tmp, _marker_path(out_dir, stage))  # atomic commit


def _encode_group(pdf: pd.DataFrame, avgdl: float, block_size: int) -> pd.DataFrame:
    """applyInPandas kernel: one (term[, salt]) group -> one encoded row."""
    term = pdf["term"].iloc[0]
    salt = int(pdf["salt"].iloc[0])
    order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
    docs = pdf["doc_id"].to_numpy()[order].astype(np.int64)
    tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
    dls = pdf["doclen"].to_numpy()[order].astype(np.float64)
    tfn = tfs / (tfs + BM25_K1 * (1.0 - BM25_B + BM25_B * (dls / avgdl)))
    enc = codec.encode_postings(docs, tfs, tfn, block_size=block_size)
    return pd.DataFrame(
        [
            {
                "term": term,
                "salt": salt,
                "df": enc.count,
                "first_doc": enc.first_doc,
                "doc_blob": enc.doc_blob,
                "tf_blob": enc.tf_blob,
                "block_n": enc.block_n.tolist(),
                "block_last_doc": enc.block_last_doc.tolist(),
                "block_doc_bytes": enc.block_doc_bytes.tolist(),
                "block_tf_bytes": enc.block_tf_bytes.tolist(),
                "block_max_tfnorm": enc.block_max_tfnorm.tolist(),
                "n_parts": 1,
                "bytes_written": len(enc.doc_blob) + len(enc.tf_blob),
            }
        ]
    )


def _merge_group(pdf: pd.DataFrame, term_buckets: int) -> pd.DataFrame:
    """applyInPandas kernel: concat a term's doc-range-disjoint partials."""
    term = pdf["term"].iloc[0]
    pdf = pdf.sort_values("first_doc")
    if len(pdf) == 1:
        row = pdf.iloc[0].to_dict()
    else:
        parts = [
            codec.EncodedPostings(
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
            for r in pdf.itertuples()
        ]
        enc = codec.concat_encoded(parts)
        row = {
            "term": term,
            "df": enc.count,
            "first_doc": enc.first_doc,
            "doc_blob": enc.doc_blob,
            "tf_blob": enc.tf_blob,
            "block_n": enc.block_n.tolist(),
            "block_last_doc": enc.block_last_doc.tolist(),
            "block_doc_bytes": enc.block_doc_bytes.tolist(),
            "block_tf_bytes": enc.block_tf_bytes.tolist(),
            "block_max_tfnorm": enc.block_max_tfnorm.tolist(),
            "n_parts": len(parts),
            "bytes_written": len(enc.doc_blob) + len(enc.tf_blob),
        }
    row.pop("salt", None)
    row["term_bucket"] = _term_bucket_py(term, term_buckets)
    return pd.DataFrame([row])


def _term_bucket_py(term: str, buckets: int) -> int:
    # stable, language-neutral bucket: first 8 bytes of the term's utf-8
    # sha-256 mod buckets (NOT xxhash: must be reproducible in Python
    # at query time without a JVM call)
    import hashlib

    h = hashlib.sha256(term.encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big") % buckets


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    analyzer: str = "morph",
    use_extractor: bool = False,
    block_size: int = codec.BLOCK_SIZE,
    target_postings_per_salt: int = 200_000,
    term_buckets: int = 64,
    resume: bool = False,
) -> BuildResult:
    os.makedirs(out_dir, exist_ok=True)
    params_fp = f"analyzer={analyzer}|block={block_size}|buckets={term_buckets}"
    stages_run, stages_skipped = [], []

    docstore_dir = os.path.join(out_dir, "docstore")
    forward_dir = os.path.join(out_dir, "forward")
    segments_dir = os.path.join(out_dir, "segments")
    lineage_dir = os.path.join(out_dir, "lineage")
    stats_path = os.path.join(out_dir, "stats.json")

    # ---- stage "docs": analyze + persist forward index & docstore -------
    # fingerprint on input content: count + order-independent url hash sum
    fp_row = pages.agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(url))").alias("h"),
    ).collect()[0]
    input_fp = f"{fp_row['n']}|{fp_row['h']}|{params_fp}"

    if resume and _stage_done(out_dir, "docs", input_fp):
        stages_skipped.append("docs")
    else:
        docs = prepare_docs(pages, analyzer=analyzer, use_extractor=use_extractor)
        docs.write.mode("overwrite").parquet(forward_dir)
        fwd = spark.read.parquet(forward_dir)
        fwd.select("doc_id", "url", "doclen").write.mode("overwrite").parquet(docstore_dir)
        n_docs_, avgdl_ = _write_stats(spark, fwd, stats_path, analyzer, block_size, term_buckets, input_fp)
        _append_lineage(
            spark, lineage_dir, stage="docs", build_fp=input_fp,
            src=fwd.groupBy(F.spark_partition_id().alias("partition_id")).agg(
                F.count("*").alias("doc_count"),
                F.lit(0).cast("long").alias("term_count"),
                F.sum("doclen").cast("long").alias("bytes_written"),
            ),
        )
        _commit_stage(out_dir, "docs", input_fp, n_docs=n_docs_, avgdl=avgdl_)
        stages_run.append("docs")

    with open(stats_path) as f:
        stats = json.load(f)
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]

    # ---- stage "segments": salted repartition-by-term encode + merge ----
    if resume and _stage_done(out_dir, "segments", input_fp):
        stages_skipped.append("segments")
    else:
        fwd = spark.read.parquet(forward_dir)
        postings = fwd.select(
            "doc_id", "doclen", F.explode("terms").alias("t")
        ).select(
            F.col("t.term").alias("term"),
            "doc_id",
            F.col("t.tf").alias("tf"),
            "doclen",
        )
        # exact df per term; map-side combine makes this skew-immune
        df_t = postings.groupBy("term").agg(F.count("*").alias("df"))
        head = df_t.filter(F.col("df") > target_postings_per_salt).select(
            "term",
            F.ceil(F.col("df") / target_postings_per_salt).cast("int").alias("n_salts"),
        )
        range_per_salt = F.ceil(F.lit(n_docs) / F.col("n_salts"))
        salted = (
            postings.join(F.broadcast(head), "term", "left")
            .withColumn("n_salts", F.coalesce(F.col("n_salts"), F.lit(1)))
            .withColumn(
                "salt",
                F.when(F.col("n_salts") == 1, F.lit(0)).otherwise(
                    (F.col("doc_id") / range_per_salt).cast("int")
                ),
            )
            .drop("n_salts")
        )
        # groupBy(term, salt) IS the salted repartition-by-term shuffle;
        # applyInPandas hash-partitions on the grouping keys.
        partials = (
            salted.groupBy("term", "salt")
            .applyInPandas(
                lambda pdf: _encode_group(pdf, avgdl=avgdl, block_size=block_size),
                schema=PARTIAL_SCHEMA,
            )
        )
        segments = partials.groupBy("term").applyInPandas(
            lambda pdf: _merge_group(pdf, term_buckets=term_buckets),
            schema=SEGMENT_SCHEMA,
        )
        (
            segments.repartition("term_bucket")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("term_bucket")
            .parquet(segments_dir)
        )
        seg = spark.read.parquet(segments_dir)
        _append_lineage(
            spark, lineage_dir, stage="segments", build_fp=input_fp,
            src=seg.groupBy(F.col("term_bucket").alias("partition_id")).agg(
                F.sum("df").alias("doc_count"),
                F.count("*").alias("term_count"),
                F.sum("bytes_written").alias("bytes_written"),
            ),
        )
        agg = seg.agg(
            F.count("*").alias("n_terms"), F.sum("df").alias("total_postings")
        ).collect()[0]
        _commit_stage(
            out_dir, "segments", input_fp,
            n_terms=int(agg["n_terms"]), total_postings=int(agg["total_postings"]),
        )
        stages_run.append("segments")

    with open(_marker_path(out_dir, "segments")) as f:
        seg_meta = json.load(f)
    return BuildResult(
        out_dir=out_dir,
        n_docs=n_docs,
        avgdl=avgdl,
        n_terms=seg_meta["n_terms"],
        total_postings=seg_meta["total_postings"],
        stages_run=stages_run,
        stages_skipped=stages_skipped,
    )


def _write_stats(spark, fwd, stats_path, analyzer, block_size, term_buckets, fp):
    row = fwd.agg(
        F.count("*").alias("n"),
        F.avg("doclen").alias("avgdl"),
        F.sum("doclen").alias("total_tokens"),
    ).collect()[0]
    stats = {
        "n_docs": int(row["n"]),
        "avgdl": float(row["avgdl"]),
        "total_tokens": int(row["total_tokens"]),
        "analyzer": analyzer,
        "block_size": block_size,
        "term_buckets": term_buckets,
        "k1": BM25_K1,
        "b": BM25_B,
        "fingerprint": fp,
    }
    tmp = stats_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, stats_path)
    return stats["n_docs"], stats["avgdl"]


def _append_lineage(spark, lineage_dir, stage: str, build_fp: str, src: DataFrame):
    """Per-partition reconciliation metrics (reference: job.hadoop_event)."""
    (
        src.withColumn("stage", F.lit(stage))
        .withColumn("content_hash", F.sha2(F.concat_ws("|",
            F.lit(build_fp), F.lit(stage), F.col("partition_id").cast("string"),
            F.col("doc_count").cast("string")), 256))
        .withColumn("completed", F.lit(True))
        .write.mode("append")
        .parquet(lineage_dir)
    )
