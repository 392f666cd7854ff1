"""Text analysis operators: language-ID, quality scoring, token
counting, fingerprinting — the per-document stats a training-data
pipeline computes at ingest. All JVM-side expressions (regexp/array
built-ins), no UDFs: these run inside whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from job_searchengine_project_spark.iolayout import read_spread
from job_searchengine_project_spark.operators.dedup import _shingles, _SQL_SHINGLES, _SQL_TOKS, TOKS


def lang_id(spark, sf_dir: str) -> DataFrame:
    """Char-class n-gram heuristic language ID.

    hangul/cjk char ratios decide ko/zh; latin-script languages fall
    back to a stopword vote (en/de/es markers). Deterministic and
    purely expression-based; a real model slots in as a pandas UDF.
    """
    docs = read_spread(spark, f"{sf_dir}/documents.parquet")
    n = F.length("text")
    hangul = n - F.length(F.regexp_replace("text", "[가-힣]", ""))
    cjk = n - F.length(F.regexp_replace("text", "[\\u4e00-\\u9fff]", ""))
    toks = F.split(F.lower(F.col("text")), " ")
    def votes(words):
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.array_intersect(toks, arr))
    pred = (
        F.when(hangul * 3 > n, F.lit("ko"))
        .when(cjk * 3 > n, F.lit("zh"))
        .when(votes(["the", "and", "of"]) > 0, F.lit("en"))
        .when(votes(["der", "und", "die"]) > 0, F.lit("de"))
        .when(votes(["el", "los", "que"]) > 0, F.lit("es"))
        .otherwise(F.lit("latin"))
    )
    return docs.select("doc_id", pred.alias("lang_pred")).orderBy("doc_id")


LANG_ID_SQL = """
WITH t AS (
  SELECT doc_id,
         length(text) AS n,
         length(text) - length(regexp_replace(text, '[가-힣]', '', 'g')) AS hangul,
         length(text) - length(regexp_replace(text, '[\\u4e00-\\u9fff]', '', 'g')) AS cjk,
         string_split(lower(text), ' ') AS toks
  FROM documents
)
SELECT doc_id,
  CASE WHEN hangul * 3 > n THEN 'ko'
       WHEN cjk * 3 > n THEN 'zh'
       WHEN len(list_intersect(toks, ['the','and','of'])) > 0 THEN 'en'
       WHEN len(list_intersect(toks, ['der','und','die'])) > 0 THEN 'de'
       WHEN len(list_intersect(toks, ['el','los','que'])) > 0 THEN 'es'
       ELSE 'latin' END AS lang_pred
FROM t ORDER BY doc_id
"""


def quality_score(spark, sf_dir: str) -> DataFrame:
    """Heuristic doc-quality score from length / punctuation / stopword
    / digit ratios (the classic webtext quality gates)."""
    docs = read_spread(spark, f"{sf_dir}/documents.parquet")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    n_chars = F.length("text")
    # count of non-kept chars == length after removing the KEPT class
    # (the two classes partition every char, so the counts are equal
    # for any input); the positive-class replace measured ~3.6x faster
    # than the negated-class form on this corpus
    punct_ratio = F.length(F.regexp_replace("text", "[a-zA-Z0-9가-힣 ]", "")) / n_chars
    digit_ratio = (n_chars - F.length(F.regexp_replace("text", "[0-9]", ""))) / n_chars
    stop = F.array(F.lit("the"), F.lit("a"), F.lit("and"), F.lit("of"))
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    stop_ratio = stop_hits / n_tok
    mean_tok_len = (n_chars - (n_tok - 1)) / n_tok
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + (1 - punct_ratio) * 0.2
        + (1 - digit_ratio) * 0.2
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.1
        + F.least(mean_tok_len / 8, F.lit(1.0)) * 0.1
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(mean_tok_len, 4).alias("mean_tok_len"),
        F.round(score, 4).alias("quality"),
    ).orderBy("doc_id")


QUALITY_SQL = """
WITH t AS (
  SELECT doc_id, text,
         len(string_split(text, ' ')) AS n_tok,
         length(text) AS n_chars,
         (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9가-힣 ]', '', 'g')))::DOUBLE / length(text) AS punct_ratio,
         (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE / length(text) AS digit_ratio,
         len(list_filter(string_split(text, ' '), x -> list_contains(['the','a','and','of'], x)))::DOUBLE
           / len(string_split(text, ' ')) AS stop_ratio,
         (length(text) - (len(string_split(text, ' ')) - 1))::DOUBLE / len(string_split(text, ' ')) AS mean_tok_len
  FROM documents
)
SELECT doc_id, n_tok AS n_tokens,
       round(stop_ratio, 4) AS stop_ratio,
       round(mean_tok_len, 4) AS mean_tok_len,
       round(least(n_tok / 100.0, 1.0) * 0.4
             + (1 - punct_ratio) * 0.2
             + (1 - digit_ratio) * 0.2
             + least(stop_ratio * 5, 1.0) * 0.1
             + least(mean_tok_len / 8, 1.0) * 0.1, 4) AS quality
FROM t ORDER BY doc_id
"""


def token_stats(spark, sf_dir: str) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per doc."""
    docs = read_spread(spark, f"{sf_dir}/documents.parquet")
    ws = F.size(F.split(F.col("text"), " "))
    bpe = F.size(F.regexp_extract_all("text", F.lit("([a-z]+|[0-9]+|[^a-z0-9\\s])"), 1))
    return docs.select(
        "doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_tokens")
    ).orderBy("doc_id")


TOKEN_STATS_SQL = """
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(text, '([a-z]+|[0-9]+|[^a-z0-9\\s])')) AS bpe_tokens
FROM documents ORDER BY doc_id
"""


def doc_fingerprint(spark, sf_dir: str) -> DataFrame:
    """Document fingerprints: content sha256 + min/max shingle hash
    (a 2-sketch winnowing fingerprint; rolling windows extend it)."""
    docs = read_spread(spark, f"{sf_dir}/documents.parquet")
    sh = _shingles(TOKS())
    hashes = F.transform(sh, lambda s: F.md5(s))
    return docs.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("content_sha"),
        F.array_min(hashes).alias("fp_min"),
        F.array_max(hashes).alias("fp_max"),
    ).orderBy("doc_id")


FINGERPRINT_SQL = f"""
WITH t AS (SELECT doc_id, text, {_SQL_TOKS} AS ts FROM documents),
s AS (SELECT doc_id, text, list_transform({_SQL_SHINGLES}, x -> md5(x)) AS hs FROM t)
SELECT doc_id, sha256(text) AS content_sha,
       list_min(hs) AS fp_min, list_max(hs) AS fp_max
FROM s ORDER BY doc_id
"""


def twogram_top20(spark, sf_dir: str) -> DataFrame:
    """ES-style 2-gram analyzer: top-20 grams by frequency.

    Exercises the same 2-gram semantics the index uses
    (schema/es/es.sh:16-29) — grams over the raw lowered string,
    whitespace included.
    """
    docs = read_spread(spark, f"{sf_dir}/documents.parquet")
    grams = F.transform(
        F.sequence(F.lit(1), F.length(F.lower(F.col("text"))) - 1),
        lambda i: F.substring(F.lower(F.col("text")), i, F.lit(2)),
    )
    return (
        docs.filter(F.length("text") >= 2)
        .select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("gram"))
        .limit(20)
    )


TWOGRAM_SQL = """
WITH g AS (
  SELECT unnest(list_transform(generate_series(1, length(lower(text)) - 1),
                i -> substr(lower(text), i::INT, 2))) AS gram
  FROM documents WHERE length(text) >= 2
)
SELECT gram, count(*) AS n FROM g GROUP BY gram ORDER BY n DESC, gram LIMIT 20
"""


QUERIES = {
    "lang_id": (lang_id, LANG_ID_SQL),
    "quality_score": (quality_score, QUALITY_SQL),
    "token_stats": (token_stats, TOKEN_STATS_SQL),
    "doc_fingerprint": (doc_fingerprint, FINGERPRINT_SQL),
    "twogram_top20": (twogram_top20, TWOGRAM_SQL),
}
