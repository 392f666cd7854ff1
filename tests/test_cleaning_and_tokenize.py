"""M1: cleaning-profile contracts + analyzer semantics."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from job_searchengine_project_spark.functions.cleaning import (
    clean_banner_col,
    clean_body_col,
    clean_ocr_text,
    clean_text_banner,
    clean_text_body,
)
from job_searchengine_project_spark.functions.tokenize import (
    STOPWORDS,
    term_freqs_series,
    tokenize_2gram_py,
    tokenize_morph,
    tokenize_morph_py,
)

BODY_CASES = [
    "안녕하세요! [백엔드] 개발자 모집 (신입/경력)",
    "  multiple   spaces\tand\nnewlines  ",
    ",leading and trailing,",
    "특수문자 @#$%^&* 제거 a/b 유지",
    "",
]

BANNER_CASES = [
    "연봉\n3000만원 ~ 5000만원",
    "서울 강남구 , 판교  ",
    "경력 3년 이상!!",
]


def test_clean_body_scalar_contract():
    assert clean_text_body("안녕하세요! [백엔드] 개발자 모집 (신입/경력)") == (
        "안녕하세요 백엔드 개발자 모집 신입/경력"
    )
    assert clean_text_body("  a   b  ") == "a b"
    assert clean_text_body(",x,") == "x"


def test_clean_banner_scalar_contract():
    assert clean_text_banner("연봉\n3000만원 ~ 5000만원") == "연봉,3000만원 ~ 5000만원"
    assert clean_text_banner("서울 강남구 , 판교  ") == "서울 강남구,판교"


def test_clean_ocr_contract():
    assert clean_ocr_text(["복지! 최고@", "  a  b  "]) == ["복지 최고", "a b"]


def test_column_cleaners_match_scalar(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": BODY_CASES + BANNER_CASES}))
    got = df.select(
        clean_body_col(F.col("t")).alias("body"),
        clean_banner_col(F.col("t")).alias("banner"),
        "t",
    ).collect()
    for r in got:
        assert r["body"] == clean_text_body(r["t"])
        assert r["banner"] == clean_text_banner(r["t"])


def test_morph_tokenizer_contract():
    toks = tokenize_morph_py("데이터 엔지니어 Spark SPARK kafka 경우 a b1 데이터")
    # dedup + sorted, len>1, stopwords out, lowercased
    assert toks == sorted({"데이터", "엔지니어", "spark", "kafka", "b1"})
    assert "경우" in STOPWORDS
    nodedup = tokenize_morph_py("데이터 데이터 spark", dedup=False)
    assert nodedup == ["데이터", "데이터", "spark"]


def test_morph_udf_matches_scalar(spark, webpages_small):
    rows = (
        webpages_small.select("text", tokenize_morph(F.col("text")).alias("m"))
        .limit(30)
        .collect()
    )
    for r in rows:
        assert list(r["m"]) == tokenize_morph_py(r["text"])


def test_2gram_contract():
    assert tokenize_2gram_py("AbC") == ["ab", "bc"]
    # ES ngram default token_chars=[] -> grams cross whitespace
    assert tokenize_2gram_py("a b") == ["a ", " b"]
    assert tokenize_2gram_py("x") == []


def test_term_freqs_is_mapside_partial_agg():
    out = term_freqs_series(pd.Series(["spark spark kafka 경우"])).iloc[0]
    assert out == [{"term": "kafka", "tf": 1}, {"term": "spark", "tf": 2}]
