"""Per-field indexing + field-scoped search (ES multi-field mapping).

The reference's ES template indexes SEPARATE fields with per-field
analyzers — `company`, `title`, `body_text` through two_gram_analyzer
and `morph` as keyword (schema/es/es.sh:33-46) — and the published
query set targets individual fields (README.md:43-71: body search,
title search, morph similarity). ES/Lucene computes BM25 PER FIELD:
each field has its own postings, df, doc length and average length.

Layout: ``out_dir/fields/<field>/`` holds one full sub-index per
field, built by the unchanged ``build_index`` over the pages projected
to (url, text=<field column>). Doc ids are assigned deterministically
from the url set alone (index/ids.py — hash-bucket offsets + in-bucket
url rank), so every field's sub-index agrees on doc_id with no
cross-field coordination; a doc's identity is shared, its stats are
per-field, exactly Lucene's per-field inverted index + norms. The
stored-field docstore is written ONCE at the top level (ES stores one
_source per doc regardless of how many fields index it).

Scoring:
- ``search_field`` = ES `match` on one field (query analyzed with THAT
  field's analyzer, BM25 with that field's df/avgdl);
- ``search_multi`` = ES `multi_match` with `most_fields` semantics:
  per-field BM25 scores of the same query SUM per doc (the ES
  most_fields combiner), tie-break ascending doc_id.

Updates: ``update_fielded_index`` appends the same batch to every
sub-index — the batch's urls get identical new doc_ids in each (same
deterministic assignment), so cross-field identity survives
incremental growth. Each sub-index keeps its own frozen-avgdl
semantics.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FIELDS_MANIFEST = "fielded.json"


def _project(pages: DataFrame, column: str) -> DataFrame:
    return pages.select("url", F.col(column).alias("text"))


def build_fielded_index(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    fields: dict[str, str],
    store_fields: bool = True,
    stored_buckets: int = 64,
    doc_values: list[str] | None = None,
    **build_kw,
) -> dict:
    """Build one sub-index per (column -> analyzer) entry.

    ``pages`` must carry ``url`` plus one column per field name. Extra
    build_index kwargs apply to every sub-index. ``doc_values``
    columns get ONE set of value-sorted sidecars at the TOP level
    (docvalues/<col>/) — doc ids are shared across every field's
    sub-index (deterministic url-derived assignment), so one sidecar
    serves range/term filters, sorts and aggs for all of them, exactly
    as ES keeps one doc-values store per index regardless of how many
    fields are analyzed."""
    from job_searchengine_project_spark.index.build import (
        _write_stored_fields,
        build_index,
    )

    os.makedirs(out_dir, exist_ok=True)
    results = {}
    for field, analyzer in fields.items():
        sub = os.path.join(out_dir, "fields", field)
        res = build_index(
            spark, _project(pages, field), sub, analyzer=analyzer,
            store_fields=False,  # the docstore lives once at the top level
            **build_kw,
        )
        results[field] = {"n_docs": res.n_docs, "avgdl": res.avgdl,
                          "n_terms": res.n_terms}
    if store_fields:
        # one _source per doc: url + every field column verbatim.
        # _write_stored_fields maps a "text" column to "body"; route the
        # page table's own body-like column into that slot (a "body"
        # field maps naturally; otherwise store a NULL body and keep
        # every field column as a stored extra).
        if "text" in pages.columns:
            pages_stored = pages
        elif "body" in pages.columns:
            pages_stored = pages.withColumnRenamed("body", "text")
        else:
            pages_stored = pages.withColumn("text", F.lit(None).cast("string"))
        _write_stored_fields(
            pages_stored,
            os.path.join(out_dir, "stored"),
            use_extractor=False, stored_buckets=stored_buckets,
        )
    if doc_values:
        # the sidecar writer resolves doc ids through a forward index;
        # every sub-index agrees on them, so point it at the first
        from job_searchengine_project_spark.index.build import _write_doc_values

        first = next(iter(fields))
        _write_doc_values(
            spark, pages, os.path.join(out_dir, "fields", first), doc_values
        )
        src = os.path.join(out_dir, "fields", first, "docvalues")
        dst = os.path.join(out_dir, "docvalues")
        if os.path.exists(dst):
            import shutil

            shutil.rmtree(dst)
        os.rename(src, dst)
    with open(os.path.join(out_dir, FIELDS_MANIFEST), "w") as f:
        json.dump(
            {"fields": fields, "store_fields": bool(store_fields),
             "stored_buckets": int(stored_buckets),
             "doc_values": sorted(doc_values) if doc_values else []},
            f,
        )
    return results


PENDING_FIELDED = "_PENDING_FIELDED.json"


def _batch_fingerprint(new_pages: DataFrame) -> str:
    """Order-independent identity of an update batch (count + xor of
    per-url hashes) — lets a replay after a mid-update crash recognise
    it is re-applying the SAME batch and skip sub-indexes that already
    committed it."""
    row = new_pages.select(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(url))").alias("h"),
    ).collect()[0]
    return f"{int(row['n'])}|{int(row['h'] or 0)}"


def update_fielded_index(
    spark: SparkSession, new_pages: DataFrame, out_dir: str, **kw
) -> dict:
    """Append the same batch to every field's sub-index (identical new
    doc_ids in each — deterministic url-derived assignment). Indexes
    built with ``doc_values`` get the new generation's sidecar rows
    appended once at the top level (``new_pages`` must carry those
    columns).

    Cross-field transaction: the per-field applies run under a
    fielded-level pending manifest (``_PENDING_FIELDED.json``) that
    records the batch fingerprint and each sub-index's pre-update
    stats fingerprint. A crash after some fields committed leaves
    their n_docs ahead of the rest; replaying the SAME batch skips the
    already-committed fields (fingerprint match) so every field ends
    at the same n_docs with the same doc_ids — the shared-doc-id
    invariant that cross-field set algebra and the shared doc-values
    sidecars rely on. A DIFFERENT batch arriving while the manifest is
    pending is refused (apply order must finish the crashed batch
    first); so is a bare n_docs mismatch with no manifest."""
    import shutil

    from job_searchengine_project_spark.index.update import (
        _purge_orphan_by_stat,
        update_index,
    )

    with open(os.path.join(out_dir, FIELDS_MANIFEST)) as f:
        manifest = json.load(f)
    dv_cols = manifest.get("doc_values") or []
    fields = sorted(manifest["fields"])
    first = fields[0]

    def _sub_stats(field: str) -> dict:
        with open(os.path.join(out_dir, "fields", field, "stats.json")) as f:
            return json.load(f)

    bfp = _batch_fingerprint(new_pages)
    pend_path = os.path.join(out_dir, PENDING_FIELDED)
    if os.path.exists(pend_path):
        with open(pend_path) as f:
            pend = json.load(f)
        if pend.get("batch_fp") != bfp:
            raise RuntimeError(
                "a previous fielded update crashed mid-apply; replay that "
                "batch before applying a new one "
                f"(pending {pend.get('batch_fp')!r}, got {bfp!r})"
            )
        n_old = int(pend["n_old"])
        skip = {
            f for f in fields
            if _sub_stats(f).get("fingerprint") != pend["pre"].get(f)
        }
    else:
        n_by_field = {f: int(_sub_stats(f)["n_docs"]) for f in fields}
        if len(set(n_by_field.values())) > 1:
            raise RuntimeError(
                "fielded sub-indexes disagree on n_docs with no pending "
                f"manifest to repair from: {n_by_field} — the shared "
                "doc-id invariant is broken; rebuild the fielded index"
            )
        n_old = n_by_field[first]
        pend = {
            "batch_fp": bfp,
            "n_old": n_old,
            "pre": {f: _sub_stats(f).get("fingerprint") for f in fields},
        }
        tmp = pend_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(pend, f)
        os.replace(tmp, pend_path)
        skip = set()

    out = {}
    for field in fields:
        if field in skip:
            out[field] = {"skipped": "already committed (replay)"}
            continue
        sub = os.path.join(out_dir, "fields", field)
        out[field] = update_index(spark, _project(new_pages, field), sub, **kw)
    if dv_cols:
        from job_searchengine_project_spark.index.build import _write_doc_values

        # idempotent sidecar append: drop any files of THIS generation
        # left by a crashed prior attempt (per-file row-group min
        # doc_id >= n_old identifies them), then write fresh. The
        # writer resolves ids via <dir>/forward; point it at the first
        # sub-index, then move the appended files up.
        sub = os.path.join(out_dir, "fields", first)
        shutil.rmtree(os.path.join(sub, "docvalues"), ignore_errors=True)
        for c in dv_cols:
            _purge_orphan_by_stat(
                os.path.join(out_dir, "docvalues", c), "doc_id", n_old
            )
        _write_doc_values(spark, new_pages, sub, dv_cols, min_doc_id=n_old)
        for c in dv_cols:
            src = os.path.join(sub, "docvalues", c)
            dst = os.path.join(out_dir, "docvalues", c)
            for fname in os.listdir(src):
                if not fname.startswith("_"):
                    os.rename(
                        os.path.join(src, fname), os.path.join(dst, fname)
                    )
        shutil.rmtree(os.path.join(sub, "docvalues"), ignore_errors=True)
    os.remove(pend_path)
    return out


class FieldedSearchEngine:
    """Field-scoped queries over a fielded index directory."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, FIELDS_MANIFEST)) as f:
            self.manifest = json.load(f)
        self.fields: dict[str, str] = self.manifest["fields"]
        self._engines: dict[str, object] = {}

    def engine(self, field: str):
        from job_searchengine_project_spark.search.engine import SearchEngine

        if field not in self.fields:
            raise KeyError(
                f"unknown field {field!r}; indexed fields: {sorted(self.fields)}"
            )
        if field not in self._engines:
            self._engines[field] = SearchEngine(
                os.path.join(self.index_dir, "fields", field)
            )
        return self._engines[field]

    def search_field(self, query: str, field: str, k: int = 10, **kw):
        """ES `match` on one field: the query string is analyzed with
        THAT field's analyzer and scored with its df/avgdl stats."""
        return self.engine(field).search_text(query, k=k, **kw)

    def doc_values_docs(self, col: str, **bounds) -> set[int]:
        """Range/term filter over the index's SHARED doc-values
        sidecars (one per column at the top level — doc ids agree
        across every field's sub-index). Tombstones come from the
        first sub-index; fielded deletes apply the same batch to all."""
        from job_searchengine_project_spark.search.engine import doc_values_docs_at

        first = self.engine(sorted(self.fields)[0])
        return doc_values_docs_at(
            self.index_dir, self.manifest.get("doc_values", []),
            first.tombstones, col, **bounds,
        )

    def _clause_acc(self, field: str, query: str) -> dict[int, float]:
        eng = self.engine(field)
        return eng.accumulate_scores(eng._analyze(query))

    def _clause_hits(self, field: str, query: str) -> set[int]:
        eng = self.engine(field)
        return eng._match_docs(eng._analyze(query))

    def search_bool(
        self,
        must: list[tuple[str, str]] = (),
        should: list[tuple[str, str]] = (),
        must_not: list[tuple[str, str]] = (),
        filter: list[tuple[str, str]] = (),
        k: int = 10,
        minimum_should_match: int | None = None,
        filter_docs: list[set[int]] = (),
        must_not_docs: list[set[int]] = (),
    ) -> list[tuple[int, float]]:
        """ES `bool` with per-clause FIELD targeting — the full ES
        request shape ({"match": {"title": ...}} clauses under
        must/should/must_not/filter). Each clause is a (field, query)
        pair analyzed with THAT field's analyzer and scored with its
        df/avgdl stats; clause hit sets and scores compose with the
        same algebra as the single-index engine (SearchEngine.
        bool_algebra — doc ids are shared across sub-indexes by the
        deterministic url-derived assignment, so cross-field set ops
        are exact). ``filter_docs``/``must_not_docs`` take precomputed
        hit sets (doc-values range/term filters). Returns
        [(doc_id, score)] rank-ordered."""
        from job_searchengine_project_spark.search.engine import SearchEngine

        must, should = list(must), list(should)
        must_not, filter = list(must_not), list(filter)
        filter_docs, must_not_docs = list(filter_docs), list(must_not_docs)
        if minimum_should_match is None:
            minimum_should_match = 0 if (must or filter or filter_docs) else 1
        if not (must or filter or should or filter_docs):
            return []
        scored = SearchEngine.bool_algebra(
            [self._clause_acc(f, q) for f, q in must],
            [self._clause_acc(f, q) for f, q in should],
            [self._clause_hits(f, q) for f, q in must_not] + must_not_docs,
            [self._clause_hits(f, q) for f, q in filter] + filter_docs,
            minimum_should_match,
        )
        return scored[:k]

    def search_phrase_field(self, query: str, field: str, k: int = 10, **kw):
        """ES `match_phrase` scoped to one field: the phrase is
        analyzed with THAT field's analyzer into an ordered term
        sequence and position-verified against the field's positional
        sub-index (build the fielded index with
        ``with_positions=True``)."""
        return self.engine(field).search_phrase(query, k=k, **kw)

    def query(self, body: dict) -> dict:
        """ES search-request parity over the multi-field index: the
        JSON body the reference's users send to ES (README.md:43-71 —
        body/title/company match queries, morph similarity) runs
        unchanged. Leaves name real fields and use that field's
        analyzer/stats. Supported: match, match_phrase, fuzzy,
        multi_match (most_fields), bool with field-targeted match
        leaves (+ minimum_should_match); ``from``/``size`` paginate.
        Response mirrors ES: hits.total.{value,relation} +
        hits.hits[]._id/_score."""
        from job_searchengine_project_spark.search.engine import SearchEngine

        size = int(body.get("size", 10))
        frm = int(body.get("from", 0))
        q = body.get("query") or {}
        pairs: list[tuple[int, float]] = []
        total = 0  # exact full match count (ES track_total_hits=true)
        url_field = None  # engine whose forward index resolves urls
        if q:
            ((kind, spec),) = q.items()
            if kind == "match":
                field, text = SearchEngine._leaf_field_text(spec)
                hits = self.search_field(text, field, k=frm + size)[frm:]
                eng = self.engine(field)
                total = len(eng._match_docs(eng._analyze(text)))
                url_field = field
                pairs = [(h.doc_id, h.score) for h in hits]
                urls = {h.doc_id: h.url for h in hits}
            elif kind == "match_phrase":
                field, text = SearchEngine._leaf_field_text(spec)
                ((_, mp_val),) = spec.items()
                mp_slop = (
                    int(mp_val.get("slop", 0)) if isinstance(mp_val, dict) else 0
                )
                # the phrase kernel verifies and scores every match
                # before truncating — the unpaged call costs the same
                full = self.search_phrase_field(
                    text, field, k=10**9, slop=mp_slop
                )
                total = len(full)
                hits = full[frm : frm + size]
                url_field = field
                pairs = [(h.doc_id, h.score) for h in hits]
                urls = {h.doc_id: h.url for h in hits}
            elif kind == "fuzzy":
                ((field, val),) = spec.items()
                term = val.get("value") if isinstance(val, dict) else val
                fuzz = val.get("fuzziness", 1) if isinstance(val, dict) else 1
                eng = self.engine(field)
                hits = eng.search_fuzzy(
                    [term], k=size, max_edits=int(fuzz), offset=frm
                )
                total = len(
                    eng._match_docs(eng.fuzzy_expand(term, max_edits=int(fuzz)))
                )
                url_field = field
                pairs = [(h.doc_id, h.score) for h in hits]
                urls = {h.doc_id: h.url for h in hits}
            elif kind == "multi_match":
                full = self.search_multi(
                    spec["query"], fields=spec.get("fields"),
                    type=spec.get("type", "most_fields"),
                    tie_breaker=spec.get("tie_breaker"),
                    k=10**9,
                )
                total = len(full)
                pairs = full[frm : frm + size]
                urls = None
            elif kind in ("bool", "range", "term"):
                if kind != "bool":  # standalone filter query sugar
                    spec = {"filter": [{kind: spec}]}

                def split(key, sets_ok):
                    pairs_, sets_ = [], []
                    for c in spec.get(key, []):
                        ((ck, cs),) = c.items()
                        if ck == "match":
                            pairs_.append(SearchEngine._leaf_field_text(cs))
                        elif ck in ("range", "term"):
                            if not sets_ok:
                                raise ValueError(
                                    f"{ck} clauses are filter-context only"
                                )
                            ((col, bounds),) = cs.items()
                            sets_.append(
                                self.doc_values_docs(col, eq=bounds)
                                if ck == "term"
                                else self.doc_values_docs(col, **bounds)
                            )
                        else:
                            raise ValueError(f"unsupported bool leaf: {ck!r}")
                    return pairs_, sets_

                must_p, _ = split("must", sets_ok=False)
                should_p, _ = split("should", sets_ok=False)
                not_p, not_s = split("must_not", sets_ok=True)
                filt_p, filt_s = split("filter", sets_ok=True)
                # the clause algebra scores every candidate before
                # truncating — unpaged call establishes the exact total
                full = self.search_bool(
                    must=must_p, should=should_p,
                    must_not=not_p, filter=filt_p,
                    filter_docs=filt_s, must_not_docs=not_s,
                    minimum_should_match=spec.get("minimum_should_match"),
                    k=10**9,
                )
                total = len(full)
                pairs = full[frm : frm + size]
                urls = None
            else:
                raise ValueError(f"unsupported query kind: {kind!r}")
        else:
            urls = None
        if pairs and urls is None:
            eng = self.engine(url_field or sorted(self.fields)[0])
            eng._fetch_urls([d for d, _ in pairs])
            urls = {d: eng.url_of(d) for d, _ in pairs}
        return {
            "hits": {
                # exact total, relation always "eq" (the kernels
                # materialize the full match set anyway)
                "total": {"value": int(total), "relation": "eq"},
                "hits": [
                    {"_id": urls[d], "_score": s} for d, s in pairs
                ],
            }
        }

    def search_multi(
        self,
        query: str,
        fields: list[str] | None = None,
        k: int = 10,
        type: str = "most_fields",
        tie_breaker: float | None = None,
    ):
        """ES `multi_match`. ``type``:

        - ``most_fields``: per-field BM25 scores SUM per doc (fields
          sum in sorted-field order — a fixed float summation order,
          like sorted-term within a field);
        - ``best_fields`` (ES's default combiner): score = the BEST
          single field's score + ``tie_breaker`` x each other matching
          field's score (ES dis_max semantics; tie_breaker defaults to
          0.0). The non-best contributions also add in sorted-field
          order, so DuckDB oracles reproduce scores exactly.

        Exact: every matched doc is accumulated per field before the
        global top-k. Returns [(doc_id, score)] rank-ordered, asc
        doc_id tie-break."""
        if type not in ("most_fields", "best_fields"):
            raise ValueError(f"unsupported multi_match type: {type!r}")
        tb = float(tie_breaker) if tie_breaker is not None else 0.0
        fields = sorted(fields if fields is not None else self.fields)
        per_field: list[dict[int, float]] = []
        for field in fields:
            eng = self.engine(field)
            terms = eng._analyze(query)
            if not terms:
                continue
            per_field.append(eng.accumulate_scores(terms))
        acc: dict[int, float] = {}
        if type == "most_fields":
            for facc in per_field:
                for d, s in facc.items():
                    acc[d] = acc.get(d, 0.0) + s
        else:  # best_fields
            for d in {d for facc in per_field for d in facc}:
                scores = [facc[d] for facc in per_field if d in facc]
                best = max(scores)
                bi = scores.index(best)  # first max counts as "best"
                s = best
                for j, fs in enumerate(scores):  # sorted-field order
                    if j != bi:
                        s += tb * fs
                acc[d] = s
        top = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return top
