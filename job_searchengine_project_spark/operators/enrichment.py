"""Enrichment patterns from the reference pipeline, on test data.

- ``ocr_enrichment``: the full J2 shape (warehouse/warehouse.py:104-133):
  explode a per-doc image-hash array, join a keyed OCR side table,
  group-concat the texts back into the body — including the
  completeness gate (a doc with ANY missing OCR result is flagged and
  left unenriched, the batch-level analog of the reference's
  sleep-and-retry barrier, warehouse.py:112-120).
- ``bm25_morph_topk``: the reference's morph-field similarity search
  (README.md:67-71): exact multi-term match over *deduplicated*
  content tokens — keyword postings, tf == 1 by construction.
- ``scalar_functions``: F7/F8/F10 — content-hash shard prefixes,
  timestamp file naming, template substitution.
- ``url_normalize``: F5 — stdlib urljoin as a vectorized pandas UDF
  (the one scalar the reference computes in Python that has no exact
  JVM builtin), SQL-mirrored on constrained inputs.

Side tables are derived deterministically from ``documents`` (md5 of
doc ids), so the DuckDB oracle rebuilds them bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from job_searchengine_project_spark import BM25_B, BM25_K1
from job_searchengine_project_spark.iolayout import read_spread


def _doc_images(docs: DataFrame) -> DataFrame:
    """(doc_id, img_hash): doc_id % 4 images per doc, md5-derived."""
    n = F.pmod(F.col("doc_id"), F.lit(4)).cast("int")
    hashes = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("_"), i.cast("string"))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select("doc_id", F.explode(hashes).alias("img_hash"))


_SQL_DOC_IMAGES = """
SELECT doc_id, unnest(CASE WHEN doc_id % 4 > 0 THEN
         list_transform(generate_series(1, (doc_id % 4)::INT),
                        i -> md5(doc_id::VARCHAR || '_' || i::VARCHAR))
       ELSE [] END) AS img_hash
FROM documents
"""


def ocr_enrichment(spark, sf_dir: str) -> DataFrame:
    docs = read_spread(spark, f"{sf_dir}/documents.parquet").select("doc_id", "text")
    imgs = _doc_images(docs)
    # OCR results exist for ~15/16 of images (the gate probe); the
    # predicate is the hash's first nibble — portable to the SQL oracle
    # (Spark xxhash64 and DuckDB hash() don't match)
    nibble = F.instr(F.lit("0123456789abcdef"), F.substring("img_hash", 1, 1)) - 1
    ocr = imgs.filter(nibble != 0).select(
        "img_hash", F.concat(F.lit("ocr "), F.substring("img_hash", 1, 6)).alias("ocr_text")
    )

    joined = imgs.join(F.broadcast(ocr), "img_hash", "left")
    per_doc = joined.groupBy("doc_id").agg(
        F.count("*").alias("n_imgs"),
        F.count("ocr_text").alias("n_ocr"),
        F.array_join(F.sort_array(F.collect_list("ocr_text")), " ").alias("ocr_concat"),
    )
    out = (
        docs.join(per_doc, "doc_id", "left")
        .withColumn("complete", F.coalesce(F.col("n_imgs") == F.col("n_ocr"), F.lit(True)))
        .withColumn(
            "enriched_sha",
            F.sha2(
                F.when(
                    F.col("complete") & F.col("ocr_concat").isNotNull() & (F.col("ocr_concat") != ""),
                    F.concat(F.col("text"), F.lit(" "), F.col("ocr_concat")),
                ).otherwise(F.col("text")),
                256,
            ),
        )
    )
    return out.select("doc_id", "complete", "enriched_sha").orderBy("doc_id")


OCR_ENRICHMENT_SQL = f"""
WITH imgs AS ({_SQL_DOC_IMAGES}),
ocr AS (
  SELECT img_hash, 'ocr ' || substr(img_hash, 1, 6) AS ocr_text
  FROM imgs WHERE strpos('0123456789abcdef', substr(img_hash, 1, 1)) - 1 != 0
),
joined AS (
  SELECT i.doc_id, i.img_hash, o.ocr_text
  FROM imgs i LEFT JOIN ocr o USING (img_hash)
),
per_doc AS (
  SELECT doc_id, count(*) AS n_imgs, count(ocr_text) AS n_ocr,
         string_agg(ocr_text, ' ' ORDER BY ocr_text) AS ocr_concat
  FROM joined GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.n_imgs = p.n_ocr, TRUE) AS complete,
       sha256(CASE WHEN coalesce(p.n_imgs = p.n_ocr, TRUE)
                        AND p.ocr_concat IS NOT NULL AND p.ocr_concat != ''
                   THEN d.text || ' ' || p.ocr_concat
                   ELSE d.text END) AS enriched_sha
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


MORPH_QUERY = ["spark", "table", "window", "stream"]


def bm25_morph_topk(spark, sf_dir: str) -> DataFrame:
    """Multi-term similarity search over the deduplicated morph field
    (keyword postings: tf=1), BM25-scored, top-10."""
    docs = read_spread(spark, f"{sf_dir}/documents.parquet").select("doc_id", "text")
    morph = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.filter(F.split("text", " "), lambda t: F.length(t) > 1))
        ).alias("term"),
    )
    dl = morph.groupBy("doc_id").agg(F.count("*").alias("doclen"))
    # corpus stats as a broadcast single-row aggregate (no separate
    # driver-collect job re-running the tokenize pipeline)
    stats = dl.agg(
        F.count("*").cast("double").alias("n"), F.avg("doclen").alias("avgdl")
    )
    hits = morph.filter(F.col("term").isin(MORPH_QUERY))
    df_t = hits.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        hits.join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "part",
            F.log1p((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * (F.lit(1.0) / (F.lit(1.0) + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("doclen") / F.col("avgdl")))),
        )
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("term", "part"))).alias("ps"))
        .withColumn("score", F.round(F.aggregate("ps", F.lit(0.0), lambda a, x: a + x["part"]), 4))
    )
    return scored.select("doc_id", "score").orderBy(F.desc("score"), F.asc("doc_id")).limit(10)


BM25_MORPH_SQL = f"""
WITH morph AS (
  SELECT DISTINCT doc_id, t.tok AS term
  FROM documents, unnest(string_split(text, ' ')) AS t(tok)
  WHERE length(t.tok) > 1
),
dl AS (SELECT doc_id, count(*) AS doclen FROM morph GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n, avg(doclen) AS avgdl FROM dl),
hits AS (SELECT doc_id, term FROM morph WHERE term IN ({", ".join(repr(t) for t in MORPH_QUERY)})),
dft AS (SELECT term, count(*) AS df FROM hits GROUP BY term),
scored AS (
  SELECT h.doc_id,
         round(sum(ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5))
             * (1.0 / (1.0 + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.doclen / s.avgdl)))), 4) AS score
  FROM hits h JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY h.doc_id
)
SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 10
"""


def scalar_functions(spark, sf_dir: str) -> DataFrame:
    """F7 shard prefix + F8 timestamp naming + F10 template substitution."""
    ev = read_spread(spark, f"{sf_dir}/events.parquet")
    h = F.md5(F.col("props"))
    return ev.select(
        "event_id",
        F.concat_ws("/", F.substring(h, 1, 2), F.substring(h, 3, 2)).alias("shard"),
        F.date_format(F.col("ts"), "yyyyMMddHHmmss").alias("fname"),
        F.format_string("%s-%06d.ndjson", F.col("event_type"), F.col("event_id")).alias("batch_name"),
    ).orderBy("event_id").limit(500)


SCALAR_FNS_SQL = """
SELECT event_id,
       substr(md5(props), 1, 2) || '/' || substr(md5(props), 3, 2) AS shard,
       strftime(ts, '%Y%m%d%H%M%S') AS fname,
       printf('%s-%06d.ndjson', event_type, event_id) AS batch_name
FROM events ORDER BY event_id LIMIT 500
"""


@F.pandas_udf(T.StringType())
def urljoin_udf(base: pd.Series, href: pd.Series) -> pd.Series:
    """F5: stdlib urljoin, vectorized (reference: crawling_class.py:217-219)."""
    from urllib.parse import urljoin

    return pd.Series(
        [urljoin(b, h).strip() for b, h in zip(base, href)], dtype="object"
    )


def url_normalize(spark, sf_dir: str) -> DataFrame:
    docs = read_spread(spark, f"{sf_dir}/documents.parquet")
    base = F.concat(F.lit("https://example-"), F.col("source"), F.lit(".test/list/index.html"))
    href = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.lit("https://other.test/abs/"), F.col("doc_id").cast("string")),
    ).when(
        F.col("doc_id") % 3 == 1,
        F.concat(F.lit("detail/"), F.col("doc_id").cast("string")),  # relative
    ).otherwise(
        F.concat(F.lit("/root/"), F.col("doc_id").cast("string"))  # absolute path
    )
    return docs.select(
        "doc_id", urljoin_udf(base, href).alias("href_norm")
    ).orderBy("doc_id")


URL_NORMALIZE_SQL = """
SELECT doc_id,
  CASE WHEN doc_id % 3 = 0 THEN 'https://other.test/abs/' || doc_id::VARCHAR
       WHEN doc_id % 3 = 1 THEN 'https://example-' || source || '.test/list/detail/' || doc_id::VARCHAR
       ELSE 'https://example-' || source || '.test/root/' || doc_id::VARCHAR
  END AS href_norm
FROM documents ORDER BY doc_id
"""


QUERIES = {
    "ocr_enrichment": (ocr_enrichment, OCR_ENRICHMENT_SQL),
    "bm25_morph_topk": (bm25_morph_topk, BM25_MORPH_SQL),
    "scalar_functions": (scalar_functions, SCALAR_FNS_SQL),
    "url_normalize": (url_normalize, URL_NORMALIZE_SQL),
}


# ---- P1/P2: XPath field projection + keyword-cascade banner ------------------

def xpath_projection(spark, sf_dir: str) -> DataFrame:
    """P1/P2 (crawling_class.py:205-278): XPath field extraction with
    a first-hit-wins cascade, on synthesized job-card XML.

    Docs with doc_id % 5 == 0 omit <pay> (the cascade falls through to
    <reward>); docs with doc_id % 7 == 0 omit <title> and are REJECTED
    (the reference raises on missing required fields).
    """
    docs = read_spread(spark, f"{sf_dir}/documents.parquet")
    xml = F.concat(
        F.lit("<job><company>co_"), F.col("source"), F.lit("</company>"),
        F.when(F.col("doc_id") % 7 != 0,
               F.concat(F.lit("<title>doc "), F.col("doc_id").cast("string"), F.lit("</title>"))
               ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 != 0,
               F.concat(F.lit("<pay>"), (F.col("doc_id") * 10).cast("string"), F.lit("</pay>"))
               ).otherwise(F.lit("")),
        F.lit("<reward>"), (F.col("doc_id") + 1).cast("string"), F.lit("</reward></job>"),
    )
    proj = docs.select("doc_id", xml.alias("xml")).select(
        "doc_id",
        F.expr("xpath_string(xml, '/job/company')").alias("company"),
        F.expr("nullif(xpath_string(xml, '/job/title'), '')").alias("title"),
        F.expr(
            "coalesce(nullif(xpath_string(xml, '/job/pay'), ''),"
            " nullif(xpath_string(xml, '/job/reward'), ''))"
        ).alias("pay"),
    )
    # required-field rejection (reference: raise -> row dropped)
    return proj.filter(F.col("title").isNotNull()).orderBy("doc_id")


# the oracle reconstructs the same projection from the generation rule
# (DuckDB has no xpath; the synthesized XML makes the expectation
# derivable in plain SQL — the Spark side still exercises real xpath)
XPATH_SQL = """
SELECT doc_id,
       'co_' || source AS company,
       'doc ' || doc_id::VARCHAR AS title,
       CASE WHEN doc_id % 5 != 0 THEN (doc_id * 10)::VARCHAR
            ELSE (doc_id + 1)::VARCHAR END AS pay
FROM documents
WHERE doc_id % 7 != 0
ORDER BY doc_id
"""

QUERIES["xpath_projection"] = (xpath_projection, XPATH_SQL)
