"""Text normalization profiles.

Three cleaning profiles reproduce the reference's normalization
contracts exactly (semantics, not code):

- body profile   — reference ``_clean_text_body``
  (common/crawling_class.py:246-250): drop every char outside
  ``가-힣a-zA-Z0-9``, whitespace and ``/``; collapse runs of
  whitespace to one space; strip; strip leading/trailing commas.
- banner profile — reference ``_clean_text_banner``
  (common/crawling_class.py:235-244): newlines -> commas; keep
  ``가-힣a-zA-Z0-9,\\s~.``; collapse whitespace; remove spaces
  around commas; strip.
- ocr profile    — reference ``_clean_ocr_text``
  (common/job_class.py:137-147): keep ``가-힣a-zA-Z0-9\\s/~.``
  (dropped runs become a single space); collapse whitespace; strip.

Each profile exists in three forms: a pure-Python scalar function
(the byte-parity test reference), a vectorized ``pd.Series`` form
(used inside Arrow pandas UDFs — C-level regex loops, no per-row
Python), and a Spark ``Column`` expression chain (JVM-side,
whole-stage-codegen'd — the preferred hot path).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# --- body profile -----------------------------------------------------------

_BODY_DROP = r"[^가-힣a-zA-Z0-9\s/]+"
_WS_RUN = r"\s+"


def clean_text_body(text: str) -> str:
    """Scalar body-profile normalizer (reference-contract form)."""
    text = re.sub(_BODY_DROP, "", text)
    text = re.sub(_WS_RUN, " ", text).strip()
    return text.strip(",")


def clean_body_series(s: pd.Series) -> pd.Series:
    """Vectorized body-profile normalizer over a string Series."""
    s = s.str.replace(_BODY_DROP, "", regex=True)
    s = s.str.replace(_WS_RUN, " ", regex=True).str.strip()
    return s.str.strip(",")


def clean_body_col(col: Column) -> Column:
    """JVM-side body-profile normalizer (regexp_replace chain)."""
    c = F.regexp_replace(col, _BODY_DROP, "")
    c = F.trim(F.regexp_replace(c, _WS_RUN, " "))
    # strip(",") on an already-whitespace-trimmed string
    return F.regexp_replace(c, r"^,+|,+$", "")


# --- banner profile ----------------------------------------------------------

_BANNER_DROP = r"[^가-힣a-zA-Z0-9,\s~.]"
_COMMA_WS = r"\s*,\s*"


def clean_text_banner(text: str) -> str:
    """Scalar banner-profile normalizer (reference-contract form)."""
    text = text.replace("\n", ",")
    text = re.sub(_BANNER_DROP, " ", text)
    text = re.sub(_WS_RUN, " ", text)
    text = re.sub(_COMMA_WS, ",", text)
    return text.strip()


def clean_banner_series(s: pd.Series) -> pd.Series:
    s = s.str.replace("\n", ",", regex=False)
    s = s.str.replace(_BANNER_DROP, " ", regex=True)
    s = s.str.replace(_WS_RUN, " ", regex=True)
    s = s.str.replace(_COMMA_WS, ",", regex=True)
    return s.str.strip()


def clean_banner_col(col: Column) -> Column:
    c = F.regexp_replace(col, r"\n", ",")
    c = F.regexp_replace(c, _BANNER_DROP, " ")
    c = F.regexp_replace(c, _WS_RUN, " ")
    c = F.regexp_replace(c, _COMMA_WS, ",")
    return F.trim(c)


# --- ocr profile --------------------------------------------------------------

_OCR_DROP = r"[^가-힣a-zA-Z0-9\s/~.]+"


def clean_ocr_text(texts: list[str]) -> list[str]:
    """Array-in/array-out OCR normalizer (reference-contract form)."""
    out = []
    for text in texts:
        text = re.sub(_OCR_DROP, " ", text)
        text = re.sub(_WS_RUN, " ", text).strip()
        out.append(text)
    return out


def clean_ocr_col(col: Column) -> Column:
    """Element-wise OCR normalizer over an array<string> column."""
    return F.transform(
        col,
        lambda x: F.trim(
            F.regexp_replace(F.regexp_replace(x, _OCR_DROP, " "), _WS_RUN, " ")
        ),
    )
