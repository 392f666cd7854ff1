"""Persisted sorted term dictionary: prefix/wildcard query artifact.

ES serves `prefix` and `wildcard` queries from Lucene's term
dictionary FST (the reference's two-gram fields make prefix search a
natural part of its mapping surface, schema/es/es.sh:16-29). The
segments layout here hash-buckets terms (right for point lookups,
wrong for ordered scans), so ordered term access gets its own
artifact, exactly like the fuzzy variants table (index/fuzzy.py):

- ``term_dict/`` holds the distinct vocabulary globally SORTED BY
  term (one distributed distinct + range-partitioned sort at build
  time) — a prefix lookup reads only the row groups covering
  [prefix, prefix~) via parquet min/max statistics;
- a ``_TERMDICT_META.json`` commit marker records the index
  fingerprint the table was derived from; updates/compactions change
  the fingerprint and readers refuse the stale table (missing new
  vocabulary silently would be wrong);
- wildcard patterns prune by their literal prefix (everything before
  the first ``*``/``?``), then verify with fnmatch; a
  leading-wildcard pattern degrades to a full dictionary scan — the
  same cost cliff ES documents for leading wildcards.

Scoring contract (ES parity): prefix/wildcard are multi-term queries
that ES rewrites to constant_score by default — every matching doc
scores 1.0; ties order by doc_id asc (our pinned internal order).
"""

from __future__ import annotations

import json
import os
from fnmatch import fnmatchcase

import pyarrow.dataset as pads
from pyspark.sql import SparkSession

TERMDICT_DIR = "term_dict"
_META = "_TERMDICT_META.json"


def termdict_dir(index_dir: str) -> str:
    return os.path.join(index_dir, TERMDICT_DIR)


def build_term_dictionary(spark: SparkSession, index_dir: str) -> str:
    """Materialize the sorted vocabulary (idempotent overwrite; the
    meta marker written AFTER the parquet is the commit point)."""
    out = termdict_dir(index_dir)
    with open(os.path.join(index_dir, "stats.json")) as f:
        fingerprint = json.load(f).get("fingerprint", "")
    (
        spark.read.parquet(os.path.join(index_dir, "segments"))
        .select("term")
        .distinct()
        .orderBy("term")  # range partition: prefix-pruned lookups
        .write.mode("overwrite")
        .parquet(out)
    )
    tmp = os.path.join(out, _META + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"fingerprint": fingerprint}, f)
    os.replace(tmp, os.path.join(out, _META))
    return out


def termdict_fresh(index_dir: str) -> bool:
    meta = os.path.join(termdict_dir(index_dir), _META)
    if not os.path.exists(meta):
        return False
    with open(meta) as f:
        built_from = json.load(f).get("fingerprint")
    with open(os.path.join(index_dir, "stats.json")) as f:
        return built_from == json.load(f).get("fingerprint", "")


def _require_fresh(index_dir: str) -> str:
    if not termdict_fresh(index_dir):
        raise FileNotFoundError(
            f"no fresh term dictionary at {termdict_dir(index_dir)}; run "
            "build_term_dictionary (again after any update/compaction)"
        )
    return termdict_dir(index_dir)


def prefix_terms(index_dir: str, prefix: str) -> list[str]:
    """Indexed terms starting with ``prefix`` — a range-pruned read of
    the sorted dictionary ([prefix, next-sibling)), never a
    vocabulary scan."""
    if not prefix:
        raise ValueError("empty prefix")
    root = _require_fresh(index_dir)
    expr = pads.field("term") >= prefix
    # right bound: bump the last char; max-codepoint last chars fall
    # back to the open range (post-filter still guards exactness)
    last = prefix[-1]
    if ord(last) < 0x10FFFF:
        expr = expr & (pads.field("term") < prefix[:-1] + chr(ord(last) + 1))
    tbl = pads.dataset(root).to_table(columns=["term"], filter=expr)
    return sorted(t for t in tbl.column("term").to_pylist() if t.startswith(prefix))


def wildcard_terms(index_dir: str, pattern: str) -> list[str]:
    """Indexed terms matching an ES wildcard pattern (``*`` = any run,
    ``?`` = one char): literal-prefix pruned, fnmatch verified."""
    root = _require_fresh(index_dir)
    lit = ""
    for ch in pattern:
        if ch in "*?":
            break
        lit += ch
    if lit:
        expr = pads.field("term") >= lit
        if ord(lit[-1]) < 0x10FFFF:
            expr = expr & (pads.field("term") < lit[:-1] + chr(ord(lit[-1]) + 1))
        tbl = pads.dataset(root).to_table(columns=["term"], filter=expr)
    else:
        # leading wildcard: full dictionary read (the documented ES
        # cost cliff — still vocabulary-, not corpus-, sized)
        tbl = pads.dataset(root).to_table(columns=["term"])
    return sorted(
        t for t in tbl.column("term").to_pylist() if fnmatchcase(t, pattern)
    )
