"""Dense, deterministic document-id assignment.

The engine needs dense integer doc_ids (delta compression, doclen
arrays). The assignment must be deterministic in the *content* —
independent of partition count and execution order — mirroring the
reference's content-hash identity design (collector/collector.py:149).

Two-phase, shuffle-bounded scheme:
1. bucket = pmod(xxhash64(url), B) — deterministic hash bucket;
2. one small aggregation computes per-bucket counts -> cumulative
   offsets (B rows to the driver, broadcast back);
3. doc_id = offset[bucket] + rank(url within bucket).

The per-bucket rank is a Window partitioned by bucket: a single
hash shuffle, each bucket sorted independently — no global sort, no
single-partition bottleneck, scales to 10^12 rows with B sized to
keep buckets executor-memory-resident.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_doc_ids(
    df: DataFrame,
    id_col: str = "url",
    buckets: int = 256,
    bucket_counts: dict[int, int] | None = None,
) -> DataFrame:
    """Add a dense ``doc_id`` long column, deterministic in ``id_col``.

    ``bucket_counts`` (bucket -> row count) may be precomputed by the
    caller to fold the counting scan into another job over the input.
    """
    bucketed = df.withColumn("_bucket", F.pmod(F.xxhash64(F.col(id_col)), F.lit(buckets)))
    counts = bucket_counts or {
        r["_bucket"]: r["n"]
        for r in bucketed.groupBy("_bucket").agg(F.count("*").alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    offset_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    w = Window.partitionBy("_bucket").orderBy(id_col)
    return (
        bucketed.withColumn(
            "doc_id",
            (F.row_number().over(w) - 1 + offset_map[F.col("_bucket")]).cast("long"),
        )
        .drop("_bucket")
    )
