"""Stage 1 of the build: pages -> analyzed documents.

``prepare_docs`` turns the input web-page table into the analyzed
document table the index build and the BM25 oracle both consume:

    (doc_id long, url string, doclen int, terms array<struct<term,tf>>)

- extraction runs the byte-identical ``extract_text`` UDF when asked
  (by default the input's ``text`` column is trusted — the invariant
  test asserts they agree anyway);
- ``terms`` carries per-doc term frequencies computed *inside* the
  tokenizer UDF (map-side partial aggregation — one row per distinct
  term per doc reaches any later shuffle, not one per token instance);
- ``doclen`` is the total token count (BM25's |d|), computed JVM-side
  with ``F.aggregate`` over the tf structs.

Shuffle hygiene: tokenization happens BEFORE the doc-id shuffle and
``html``/``text`` are dropped map-side, so the only wide rows ever
shuffled are (url, terms, doclen) — at web scale the raw html column
is 3-10x the token data and must never cross an exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from job_searchengine_project_spark.functions.extract import extract_text
from job_searchengine_project_spark.functions.tokenize import make_term_freqs_udf
from job_searchengine_project_spark.index.ids import assign_doc_ids


def prepare_docs(
    pages: DataFrame,
    analyzer: str = "morph",
    use_extractor: bool = False,
    id_buckets: int = 256,
    bucket_counts: dict[int, int] | None = None,
    with_positions: bool = False,
) -> DataFrame:
    text_col = extract_text(F.col("html")) if use_extractor else F.col("text")
    if analyzer == "morph" and not with_positions:
        # vectorized Arrow kernel (functions/tokenize.py): same
        # (terms, doclen) contract, built from flat arrays — the
        # per-row Counter/dict pandas UDF dominated the build's
        # tokenize stage
        from job_searchengine_project_spark.functions.tokenize import (
            term_freqs_arrow_morph,
        )

        narrow = pages.select("url", text_col.alias("text")).mapInArrow(
            term_freqs_arrow_morph,
            schema="url string, terms array<struct<term:string,tf:int>>, doclen int",
        )
    else:
        tf_udf = make_term_freqs_udf(analyzer, with_positions=with_positions)
        narrow = pages.select(
            "url", tf_udf(text_col).alias("terms")
        ).withColumn(
            "doclen",
            F.aggregate(F.col("terms"), F.lit(0), lambda acc, x: acc + x["tf"]),
        )
    return assign_doc_ids(
        narrow, "url", buckets=id_buckets, bucket_counts=bucket_counts
    ).select("doc_id", "url", "terms", "doclen")
