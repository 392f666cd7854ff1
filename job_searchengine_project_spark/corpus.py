"""Deterministic synthetic web-page corpus (the `input_hint` table).

Generates ``(url string, warc_ts timestamp, html binary, text string,
lang string)`` rows mirroring the reference's bilingual (Korean +
English) job-posting corpus — Zipfian vocabulary, lognormal document
lengths, guaranteed head terms with df > 20% of the corpus so the
salted-shuffle skew-split path is exercised (FIXTURES.md §1).

Determinism: every row is produced by a counter-based Philox RNG
keyed on ``(seed, doc_id)``, so the corpus is identical regardless of
partition count, generation order, or cluster size — the property the
reference gets from its content-hash msgid design
(collector/collector.py:149-152). No wall-clock, no global RNG.

Scale: generation is ``spark.range(n) -> mapInPandas`` — embarrassingly
parallel, no shuffle, no driver materialization. The html wraps the
ground-truth ``text`` inside a ``<div id="job-body">`` region with
nested tags between sentences and entity/script/style boilerplate
*outside* the region, so ``extract_text(html) == text`` byte-for-byte.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EPOCH_S = 1_700_000_000  # fixed epoch for warc_ts ramp (no wall-clock)

DOMAINS = ("saramin", "wanted", "jobplanet", "remember")  # reference platforms
JOB_TYPES = ("dataengineer", "backend", "frontend", "mlops", "devops")

# Head terms guaranteed df > ~20%: the explicit skew probes.
HEAD_TERMS = ("데이터엔지니어", "spark", "개발자")

WEBPAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)


def _build_vocab(vocab_size: int, seed: int) -> list[str]:
    """Zipf-ranked bilingual vocabulary; deterministic in (size, seed).

    HEAD_TERMS sit at mid-Zipf ranks (not 1-3): their high df comes
    from the explicit per-doc floor in the generator, producing the
    skewed-but-not-stopword profile (df 25-45%) the salted-shuffle
    path is designed for. Ranks 1-3 would make them appear in ~every
    180-token doc — saturation, not skew.
    """
    rng = np.random.Generator(np.random.Philox(key=np.uint64(seed)))
    words: list[str] = []
    seen = set(HEAD_TERMS)
    syllables = np.arange(0xAC00, 0xD7A4)  # 가-힣
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    while len(words) < vocab_size - len(HEAD_TERMS):
        if rng.random() < 0.5:
            n = int(rng.integers(2, 5))
            w = "".join(chr(c) for c in rng.choice(syllables, size=n))
        else:
            n = int(rng.integers(3, 9))
            w = "".join(rng.choice(letters, size=n))
        if w not in seen:
            seen.add(w)
            words.append(w)
    head_rank = min(60, max(3, len(words) // 4))
    vocab = words[:head_rank] + list(HEAD_TERMS) + words[head_rank:]
    return vocab


def _doc_rng(seed: int, doc_id: int) -> np.random.Generator:
    return np.random.Generator(
        np.random.Philox(key=np.uint64(seed), counter=[np.uint64(doc_id), 0, 0, 0])
    )


_BOILERPLATE_HEAD = (
    "<!DOCTYPE html><html><head><title>job &amp; career — listing</title>"
    "<style>.x{color:#fff}</style>"
    "<script>var tracked = 1 &lt; 2;</script></head>"
    "<body><!-- nav boilerplate --><nav>home &gt; jobs &copy; example</nav>"
)
_BOILERPLATE_TAIL = (
    "<footer>contact us &middot; terms &amp; privacy</footer>"
    "<script>analytics();</script></body></html>"
)


def _render_html(text: str, rng: np.random.Generator) -> str:
    """Wrap ground-truth text in tags so extraction is an invariant.

    Tokens are regrouped into short "sentences" separated by inline
    tags; tag boundaries land exactly on the single spaces of ``text``
    so that tag-strip + whitespace-collapse reproduces ``text``.
    """
    tokens = text.split(" ")
    parts: list[str] = []
    i = 0
    tags = ("p", "span", "li", "b", "h2")
    while i < len(tokens):
        n = int(rng.integers(4, 12))
        chunk = " ".join(tokens[i : i + n])
        tag = tags[int(rng.integers(0, len(tags)))]
        parts.append(f"<{tag} class=\"c{int(rng.integers(0, 9))}\">{chunk}</{tag}>")
        i += n
    return (
        _BOILERPLATE_HEAD
        + "<div id=\"job-body\">"
        + " ".join(parts)
        + "</div>"
        + _BOILERPLATE_TAIL
    )


def generate_webpages(
    spark: SparkSession,
    n_docs: int = 2_000,
    vocab_size: int = 2_000,
    zipf_s: float = 1.2,
    mean_tokens: int = 180,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic corpus: ``spark.range -> mapInPandas``."""
    vocab = _build_vocab(vocab_size, seed)
    # Zipf pmf over ranks (truncated); head terms get an extra floor below.
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    pmf = ranks**-zipf_s
    pmf /= pmf.sum()

    vocab_arr = np.array(vocab, dtype=object)
    langs = np.array(["ko", "en", "ko-en"], dtype=object)

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["id"].to_numpy():
                rng = _doc_rng(seed, int(doc_id))
                n_tok = max(8, int(rng.lognormal(np.log(mean_tokens), 0.5)))
                toks = list(rng.choice(vocab_arr, size=n_tok, p=pmf))
                # head-term floor: each head term independently present
                # in ~25/35/45% of docs -> df > 20% guaranteed.
                for j, ht in enumerate(HEAD_TERMS):
                    if rng.random() < 0.25 + 0.10 * j:
                        pos = int(rng.integers(0, len(toks)))
                        toks[pos] = ht
                text = " ".join(toks)
                html = _render_html(text, rng)
                domain = DOMAINS[int(doc_id) % len(DOMAINS)]
                job_type = JOB_TYPES[(int(doc_id) // len(DOMAINS)) % len(JOB_TYPES)]
                rows.append(
                    {
                        "url": f"https://example-{domain}.test/{job_type}/{int(doc_id)}",
                        "warc_ts": pd.Timestamp(EPOCH_S + int(doc_id), unit="s"),
                        "html": html.encode("utf-8"),
                        "text": text,
                        "lang": langs[int(doc_id) % 3],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in WEBPAGES_SCHEMA.fields])

    if partitions is None:
        partitions = max(1, min(spark.sparkContext.defaultParallelism, n_docs // 64 + 1))
    base = spark.range(0, n_docs, numPartitions=partitions)
    return base.mapInPandas(gen, schema=WEBPAGES_SCHEMA)
