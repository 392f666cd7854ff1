"""Analyzers: morphological-contract tokenizer + ES-style 2-gram.

Two analyzers mirror the reference's two indexed-field types:

- ``tokenize_morph`` reproduces the *contract* of the reference
  morphological analyzer (common/morph_analyzer.py:14-46): content
  tokens only, token length > 1, a fixed stopword set, English
  lowercased, per-document dedup. The reference uses Kiwi (Korean
  POS) + spaCy (English POS); those models are not available here, so
  the content-token rule is "runs of word characters", which is exact
  on the synthetic corpus (whose vocabulary is whole words) and
  deterministic everywhere. The reference returns ``list(set(...))``
  (unordered); we sort for determinism.

- ``tokenize_2gram`` reproduces the ES ``two_gram_analyzer``
  (schema/es/es.sh:16-29): an ngram tokenizer with
  min_gram=max_gram=2 and default token_chars=[] (i.e. 2-grams are
  taken over the *raw* analyzed string, whitespace included) plus a
  lowercase filter.

- ``term_freqs`` is the index-build workhorse: doc text ->
  array<struct<term,tf>>. Computing tf inside the UDF is a map-side
  partial aggregation: the downstream explode ships one row per
  *distinct* term per doc instead of one per token instance, which at
  10^12-doc scale removes the largest shuffle of the build.

All are Arrow pandas UDFs (vectorized C regex via ``.str.findall``;
the only Python-level loop is per *row*, over already-tokenized
lists).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Reference stopword set, common/morph_analyzer.py:9-12 (verbatim contract).
STOPWORDS = frozenset(
    {
        "경우", "사항", "이상", "이후", "통한", "위한", "따른",
        "사람인", "원티드", "리멤버", "포지션", "합격", "입사", "보상금",
    }
)

# Content-token rule: maximal runs of Korean syllables / latin / digits / '/'.
_TOKEN_RE = r"[가-힣a-z0-9/]+"


def tokenize_morph_py(text: str, dedup: bool = True) -> list[str]:
    """Scalar morph-contract tokenizer (reference form, deterministic)."""
    import re

    toks = [
        t
        for t in re.findall(_TOKEN_RE, text.lower())
        if len(t) > 1 and t not in STOPWORDS
    ]
    return sorted(set(toks)) if dedup else toks


def morph_tokens_series(s: pd.Series, dedup: bool = True) -> pd.Series:
    """Vectorized morph tokenizer over a string Series."""
    found = s.str.lower().str.findall(_TOKEN_RE)
    if dedup:
        return found.map(
            lambda ts: sorted({t for t in ts if len(t) > 1 and t not in STOPWORDS})
        )
    return found.map(lambda ts: [t for t in ts if len(t) > 1 and t not in STOPWORDS])


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_morph(text: pd.Series) -> pd.Series:
    """text -> sorted distinct content tokens (the ``morph`` field)."""
    return morph_tokens_series(text, dedup=True)


def tokenize_2gram_py(text: str) -> list[str]:
    """Scalar 2-gram analyzer (ES ngram min=max=2 + lowercase)."""
    t = text.lower()
    return [t[i : i + 2] for i in range(len(t) - 1)]


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_2gram(text: pd.Series) -> pd.Series:
    lowered = text.str.lower()
    return lowered.map(lambda t: [t[i : i + 2] for i in range(len(t) - 1)])


_TF_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType()),
            T.StructField("tf", T.IntegerType()),
        ]
    )
)

_TF_POS_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType()),
            T.StructField("tf", T.IntegerType()),
            T.StructField("pos", T.ArrayType(T.IntegerType())),
        ]
    )
)


def _token_lists(s: pd.Series, analyzer: str) -> pd.Series:
    if analyzer == "morph":
        return morph_tokens_series(s, dedup=False)
    if analyzer == "2gram":
        lowered = s.str.lower()
        return lowered.map(lambda t: [t[i : i + 2] for i in range(len(t) - 1)])
    raise ValueError(f"unknown analyzer: {analyzer}")


def term_freqs_series(s: pd.Series, analyzer: str = "morph") -> pd.Series:
    return _token_lists(s, analyzer).map(
        lambda ts: [
            {"term": term, "tf": tf} for term, tf in sorted(Counter(ts).items())
        ]
    )


def _term_pos(ts: list[str]) -> list[dict]:
    """Per-term token-stream positions (the analyzer's position order —
    char offset for 2-grams, token index for morph)."""
    d: dict[str, list[int]] = {}
    for i, t in enumerate(ts):
        d.setdefault(t, []).append(i)
    return [
        {"term": term, "tf": len(ps), "pos": ps} for term, ps in sorted(d.items())
    ]


def term_pos_series(s: pd.Series, analyzer: str = "morph") -> pd.Series:
    return _token_lists(s, analyzer).map(_term_pos)


def term_freqs_arrow_morph(batches):
    """mapInArrow kernel: (url, text) record batches -> (url, terms,
    doclen) with terms = array<struct<term,tf>> sorted by term.

    Same contract as ``term_freqs`` (morph analyzer, tf counted over
    kept tokens, per-doc term-sorted) but computed over FLAT numpy
    arrays with one lexsort per batch and the nested Arrow arrays
    built directly from offsets — the per-row Counter/sorted/dict
    pipeline of the pandas UDF was ~80% of the whole index build's
    tokenize stage. numpy '<U' ordering and Python ``sorted`` agree
    (both compare code points), so the emitted term order is
    identical."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    # findall of the maximal-run token class == RE2 split on its
    # complement with the empty boundary segments dropped — and the
    # existing keep mask (len > 1) already drops them, so the kept
    # token stream is identical while the 10^7 per-token Python string
    # objects the re.findall path materialized never exist: splitting,
    # flattening and vocabulary hashing all run in Arrow C++ (r6; the
    # lowercase stays Python str.lower for byte-parity with the scalar
    # tokenizer contract).
    split_pat = r"[^가-힣a-z0-9/]+"
    for batch in batches:
        urls = batch.column("url")
        texts = batch.column("text").to_pylist()
        n = len(texts)
        lowered = pa.array(
            [(t or "").lower() for t in texts], type=pa.string()
        )
        tok_lists = pc.split_pattern_regex(lowered, pattern=split_pat)
        n_i = pc.list_value_length(tok_lists).to_numpy().astype(np.int64)
        flat_arr = pc.list_flatten(tok_lists)
        if len(flat_arr):
            # dictionary-encode: the batch's token stream collapses to
            # its (small) vocabulary in C++, so keep-masks, length
            # checks and the LEXICOGRAPHIC rank (np.argsort on str ==
            # Python sorted — both compare code points) cost O(vocab),
            # and the per-doc sort is an integer lexsort over ranks
            d = pc.dictionary_encode(flat_arr)
            codes = d.indices.to_numpy().astype(np.int64)
            un = np.asarray(d.dictionary.to_pylist(), dtype=object)
            ulen = np.fromiter(map(len, un), dtype=np.int64, count=len(un))
            ukeep = ulen > 1
            for i in np.flatnonzero(ukeep):
                if un[i] in STOPWORDS:
                    ukeep[i] = False
            order_u = np.argsort(un)
            rank = np.empty(len(un), dtype=np.int64)
            rank[order_u] = np.arange(len(un))
            # term strings for the output resolve by C++ take on the
            # SORTED dictionary — the old object-array gather built a
            # Python string per emitted (doc, term) row (r6)
            sorted_dict = pc.take(d.dictionary, pa.array(order_u))
            rows = np.repeat(np.arange(n, dtype=np.int64), n_i)
            keep = ukeep[codes]
            rc, rk = rank[codes][keep], rows[keep]
            order = np.lexsort((rc, rk))
            rc, rk = rc[order], rk[order]
        else:
            sorted_dict = pa.array([], type=pa.string())
            rc = np.empty(0, dtype=np.int64)
            rk = np.empty(0, dtype=np.int64)
        if rc.size:
            change = np.empty(rc.size, dtype=bool)
            change[0] = True
            change[1:] = (rk[1:] != rk[:-1]) | (rc[1:] != rc[:-1])
            starts = np.flatnonzero(change)
            tfs = np.diff(np.append(starts, rc.size))
            terms_flat = pc.take(sorted_dict, pa.array(rc[starts]))
            uniq_rows = rk[starts]
        else:
            tfs = np.empty(0, dtype=np.int64)
            terms_flat = pa.array([], type=pa.string())
            uniq_rows = rk
        per_row_terms = np.bincount(uniq_rows, minlength=n)
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(per_row_terms, out=offsets[1:])
        doclen = np.bincount(rk, minlength=n).astype(np.int32)
        struct = pa.StructArray.from_arrays(
            [terms_flat.combine_chunks()
             if isinstance(terms_flat, pa.ChunkedArray) else terms_flat,
             pa.array(tfs, type=pa.int32())],
            ["term", "tf"],
        )
        terms_col = pa.ListArray.from_arrays(pa.array(offsets), struct)
        yield pa.RecordBatch.from_arrays(
            [urls, terms_col, pa.array(doclen)], ["url", "terms", "doclen"]
        )


def make_term_freqs_udf(analyzer: str = "morph", with_positions: bool = False):
    """Factory: text -> array<struct<term,tf[,pos]>> pandas UDF."""

    if with_positions:

        @F.pandas_udf(_TF_POS_SCHEMA)
        def term_freqs_pos(text: pd.Series) -> pd.Series:
            return term_pos_series(text, analyzer=analyzer)

        return term_freqs_pos

    @F.pandas_udf(_TF_SCHEMA)
    def term_freqs(text: pd.Series) -> pd.Series:
        return term_freqs_series(text, analyzer=analyzer)

    return term_freqs


term_freqs = make_term_freqs_udf("morph")
