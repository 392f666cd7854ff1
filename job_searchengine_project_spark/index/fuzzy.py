"""Persisted SymSpell delete-variant table: index-time fuzzy artifact.

The in-process fuzzy index (search/engine.py _fuzzy_index) walks the
whole term dictionary once per process — fine on one node, wrong at
10^12-doc scale where the vocabulary itself is a distributed artifact.
This module materializes the variant -> term mapping ONCE at index
time as parquet beside ``segments/``:

- one distributed pass over the distinct term dictionary expands each
  term to its <= max_edits single-character-deletion variants
  (``mapInPandas``, no shuffle until the final sort);
- the table is globally SORTED BY variant (a range-partitioned write),
  so a query term's expansion is an isin-pruned read touching only the
  row groups holding its own variants — the Lucene analog is the FST +
  Levenshtein automaton, persisted rather than rebuilt per process;
- both the driver engine (SearchEngine.fuzzy_expand) and the sharded
  path (index/sharded.py search_sharded_fuzzy) resolve expansions
  through this table when it exists; candidate verification stays
  exact Levenshtein, so the expansion set is provably identical to a
  full dictionary scan (tested).

Layout: ``<index_dir>/fuzzy_variants/edits=<K>/`` — one table per
max_edits profile; directory existence is the build marker.

Reference parity: the reference delegates fuzzy matching to
ES/Lucene's FuzzyQuery (schema/es/es.sh mapping); this is the
Spark-persisted equivalent of that automaton's candidate generation.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from job_searchengine_project_spark.search.engine import SearchEngine

FUZZY_DIR = "fuzzy_variants"


def variants_dir(index_dir: str, max_edits: int) -> str:
    return os.path.join(index_dir, FUZZY_DIR, f"edits={max_edits}")


def build_fuzzy_variants(
    spark: SparkSession, index_dir: str, max_edits: int = 1
) -> str:
    """Materialize the delete-variant table for one max_edits profile.

    One distributed expansion over the distinct term dictionary, one
    sort (range partitioning on variant) — O(vocabulary x term length)
    rows, orders of magnitude smaller than the postings. Idempotent
    (overwrite). The table records the index fingerprint it was
    derived from (``_FUZZY_META.json``, written AFTER the parquet —
    the commit marker): an update/compaction changes the fingerprint,
    readers detect the stale table and fall back / demand a rebuild
    instead of silently missing new vocabulary."""
    import json

    out = variants_dir(index_dir, max_edits)
    with open(os.path.join(index_dir, "stats.json")) as f:
        fingerprint = json.load(f).get("fingerprint", "")
    terms = (
        spark.read.parquet(os.path.join(index_dir, "segments"))
        .select("term")
        .distinct()
    )

    def expand(batches):
        for pdf in batches:
            vs, ts = [], []
            for t in pdf["term"]:
                t = str(t)
                for v in SearchEngine._delete_variants(t, max_edits):
                    vs.append(v)
                    ts.append(t)
            yield pd.DataFrame({"variant": vs, "term": ts})

    (
        terms.mapInPandas(expand, schema="variant string, term string")
        .orderBy("variant")  # range partition: variant-pruned lookups
        .write.mode("overwrite")
        .parquet(out)
    )
    tmp = os.path.join(out, "_FUZZY_META.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"fingerprint": fingerprint, "max_edits": int(max_edits)}, f)
    os.replace(tmp, os.path.join(out, "_FUZZY_META.json"))
    return out


def variants_fresh(index_dir: str, max_edits: int) -> bool:
    """True iff the persisted table exists, committed, AND was derived
    from the index's CURRENT fingerprint (updates/compactions change
    it — a stale table would silently miss new vocabulary)."""
    import json

    vdir = variants_dir(index_dir, max_edits)
    meta = os.path.join(vdir, "_FUZZY_META.json")
    if not os.path.exists(meta):
        return False
    with open(meta) as f:
        built_from = json.load(f).get("fingerprint")
    with open(os.path.join(index_dir, "stats.json")) as f:
        current = json.load(f).get("fingerprint", "")
    return built_from == current


def fuzzy_expand_terms(
    index_dir: str, query_terms: list[str], max_edits: int = 1
) -> list[str]:
    """Expand every query term through the persisted variant table
    (must exist and be FRESH — build_fuzzy_variants after the latest
    update). Driver-side but O(per-term variants), never
    vocabulary-sized."""
    from job_searchengine_project_spark.search.engine import fuzzy_expand_at

    vdir = variants_dir(index_dir, max_edits)
    if not variants_fresh(index_dir, max_edits):
        raise FileNotFoundError(
            f"no fresh persisted fuzzy variants at {vdir}; run "
            "build_fuzzy_variants (again after any update/compaction)"
        )
    out: set[str] = set()
    for t in query_terms:
        out.update(fuzzy_expand_at(vdir, t, max_edits))
    return sorted(out)
