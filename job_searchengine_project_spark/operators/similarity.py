"""Similarity search over embedding columns (array<float>).

- ``ann_cosine_topk``: brute-force cosine top-k — the exact baseline.
  Dot products stay JVM-side (``zip_with`` + ``aggregate``); the "ANN"
  at 100 TB is the LSH-bucketed variant below which prunes the pair
  space the same way MinHash banding does for near-dup.
- ``ann_threshold_pairs``: all pairs above a cosine threshold
  (boundary-tie-free for the oracle comparison).
- ``ann_lsh_bucketed``: random-hyperplane LSH — sign bits of dots
  with md5-derived ±1 hyperplanes build a bucket key; only same-bucket
  pairs are scored. SQL-oracle'd like everything else (the hyperplanes
  are md5-parity-derived, so DuckDB reproduces them exactly).

Scale: brute force is O(n·q) per query batch and exists as the
correctness oracle; the LSH variant's shuffle is on bucket keys, and
candidate scoring is bucket-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_QUERY = 10  # query vectors: vec_id < N_QUERY
TOP_K = 5
COS_THRESHOLD = 0.4
LSH_PLANES = 8
DIM = 64


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    return dot / (na * nb)


def ann_cosine_topk(spark, sf_dir: str) -> DataFrame:
    """For each query vector (vec_id < 10): top-5 neighbors by cosine.

    Rank key is (round(cos,4) DESC, neighbor_id ASC) so float-noise
    at 1e-16 can't flip ranks between engines.
    """
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    pairs = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", F.round(_cosine(F.col("qv"), F.col("embedding")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos", "rank")
        .orderBy("query_id", "rank")
    )


ANN_TOPK_SQL = f"""
WITH pairs AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.embedding, e.embedding), 4) AS cos
  FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
  WHERE q.vec_id < {N_QUERY}
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def ann_threshold_pairs(spark, sf_dir: str) -> DataFrame:
    """All vector pairs with cosine >= 0.4 (exact, order-free output)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    a, b = emb.alias("a"), emb.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn("cos", F.round(_cosine(F.col("a.embedding"), F.col("b.embedding")), 4))
        .filter(F.col("cos") >= COS_THRESHOLD)
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"), "cos")
        .orderBy("id_a", "id_b")
    )


ANN_THRESHOLD_SQL = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding, b.embedding), 4) >= {COS_THRESHOLD}
ORDER BY id_a, id_b
"""


def _hyperplane_sign(vec_col, plane: int):
    """sign of <vec, h_plane> with h_plane[d] = ±1 from md5 parity.

    The hyperplane is derived from md5('p{plane}_d{dim}') hex-digit
    parity — deterministic, dimension-wise, reproducible in SQL.
    """
    terms = F.zip_with(
        vec_col,
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda d: (
                F.instr(
                    F.lit("0123456789abcdef"),
                    F.substring(F.md5(F.concat(F.lit(f"p{plane}_d"), d.cast("string"))), 1, 1),
                )
                - 1
            )
            % 2
            * 2
            - 1,
        ),
        lambda x, s: x.cast("double") * s.cast("double"),
    )
    return (F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x) > 0).cast("int")


def ann_lsh_bucketed(spark, sf_dir: str) -> DataFrame:
    """LSH-bucketed near-neighbor pairs: 8 hyperplane sign bits form a
    bucket key; same-bucket pairs get exact cosine. Output pairs with
    cos >= 0.4 found inside buckets (recall < exact — by design)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    bucket = F.concat_ws(
        "", *[_hyperplane_sign(F.col("embedding"), p).cast("string") for p in range(LSH_PLANES)]
    )
    be = emb.withColumn("bucket", bucket)
    a, b = be.alias("a"), be.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .withColumn("cos", F.round(_cosine(F.col("a.embedding"), F.col("b.embedding")), 4))
        .filter(F.col("cos") >= COS_THRESHOLD)
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"), "cos")
        .orderBy("id_a", "id_b")
    )


_SQL_BUCKET = " || ".join(
    "(CASE WHEN ("
    + " + ".join(
        f"embedding[{d + 1}]::DOUBLE * "
        f"(((strpos('0123456789abcdef', substr(md5('p{p}_d{d}'), 1, 1)) - 1) % 2) * 2 - 1)"
        for d in range(DIM)
    )
    + ") > 0 THEN '1' ELSE '0' END)"
    for p in range(LSH_PLANES)
)

ANN_LSH_SQL = f"""
WITH be AS (SELECT vec_id, embedding, {_SQL_BUCKET} AS bucket FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cos
FROM be a JOIN be b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding, b.embedding), 4) >= {COS_THRESHOLD}
ORDER BY id_a, id_b
"""


QUERIES = {
    "ann_cosine_topk": (ann_cosine_topk, ANN_TOPK_SQL),
    "ann_threshold_pairs": (ann_threshold_pairs, ANN_THRESHOLD_SQL),
    "ann_lsh_bucketed": (ann_lsh_bucketed, ANN_LSH_SQL),
}
