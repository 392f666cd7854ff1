"""HTML -> text extraction (the per-row byte-identical invariant).

The reference extracts a posting body by XPath-selecting the body
region, stripping tags with ``w3lib.remove_tags``, then applying the
body cleaning profile (common/crawling_class.py:280-290). This module
reproduces that contract over the web-page input table
``(url, warc_ts, html binary, text, lang)``:

1. select the body region — the subtree between the first
   ``<div id="job-body">`` and its matching ``</div>`` (region marker
   plays the role of the per-domain body XPath);
2. drop ``<script>``/``<style>`` elements *with* their content,
   drop HTML comments;
3. strip remaining tags, keeping text (remove_tags semantics:
   entities are NOT decoded — surviving entity letters are then
   subject to the cleaning profile, matching reference behavior);
4. apply the body cleaning profile (``clean_text_body``).

``extract_text_py`` is the pure-Python scalar reference; the engine
path is ``extract_text``, an Arrow pandas UDF whose body is a chain of
vectorized ``.str`` regex ops (C regex loops — no per-row Python).
The corpus generator guarantees ``extract(html) == text`` per url and
the test suite asserts byte equality against ``extract_text_py``.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from job_searchengine_project_spark.functions.cleaning import (
    clean_body_series,
    clean_text_body,
)

_BODY_REGION = r"(?s)<div id=\"job-body\">(.*?)</div>"
_SCRIPT_STYLE = r"(?is)<(script|style)\b.*?>.*?</\1>"
_COMMENT = r"(?s)<!--.*?-->"
_TAG = r"(?s)<[^>]*>"


def _select_body(html: str) -> str:
    m = re.search(_BODY_REGION, html)
    return m.group(1) if m else html


def extract_text_py(html: bytes | str) -> str:
    """Pure-Python scalar extractor — the byte-parity reference."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8")
    body = _select_body(html)
    body = re.sub(_SCRIPT_STYLE, " ", body)
    body = re.sub(_COMMENT, " ", body)
    body = re.sub(_TAG, " ", body)
    return clean_text_body(body)


def extract_series(html: pd.Series) -> pd.Series:
    """Vectorized extractor over a Series of html bytes/str."""
    s = html.map(lambda b: bytes(b).decode("utf-8") if isinstance(b, (bytes, bytearray)) else b)
    s = s.str.extract(_BODY_REGION, expand=False).fillna(s)
    s = s.str.replace(_SCRIPT_STYLE, " ", regex=True)
    s = s.str.replace(_COMMENT, " ", regex=True)
    s = s.str.replace(_TAG, " ", regex=True)
    return clean_body_series(s)


@F.pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Arrow pandas UDF: html binary -> extracted, normalized text."""
    return extract_series(html)
