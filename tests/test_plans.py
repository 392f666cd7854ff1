"""Physical-plan hygiene: pushdown, pruning, broadcast — asserted.

At 100 TB these plan properties ARE the performance model; a silent
regression (a filter that stops pushing, a scan that reads all
columns) must fail here, not on a cluster.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from job_searchengine_project_spark.plans.explain import (
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)

SF = "/root/testdata/sf0.001"


def test_filter_pushes_to_parquet_scan(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").filter(F.col("doc_id") < 10)
    pf = pushed_filters(df)
    assert pf and any("LessThan(doc_id,10)" in p for p in pf), pf


def test_projection_prunes_scan_columns(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_quantity")
    cols = read_schema_columns(df)
    assert cols == [["l_orderkey", "l_quantity"]], cols


def test_oracle_join_broadcasts_small_side(spark):
    from job_searchengine_project_spark.operators.relational import revenue_by_nation

    df = revenue_by_nation(spark, SF)
    assert has_broadcast_join(df)


def test_segment_scan_prunes_by_term_bucket(spark, tmp_path):
    """The query path's segment read must partition-prune on
    term_bucket and push the term filter."""
    from job_searchengine_project_spark.corpus import generate_webpages
    from job_searchengine_project_spark.index.build import build_index

    pages = generate_webpages(spark, n_docs=60, vocab_size=120, seed=5)
    out = str(tmp_path / "idx")
    build_index(spark, pages, out, term_buckets=8)
    seg = spark.read.parquet(f"{out}/segments").filter(
        (F.col("term_bucket") == 3) & (F.col("term") == "spark")
    )
    pf = pushed_filters(seg)
    assert pf and any("EqualTo(term,spark)" in p for p in pf), pf
    # partition filter shows as pruned partitions, not data filters
    from job_searchengine_project_spark.plans.explain import plan_str

    assert "PartitionFilters" in plan_str(seg)


def test_bm25_oracle_single_wide_shuffle(spark):
    """r6: BM25 scoring is fully map-side — doclen/tf/partials are
    per-doc expressions and the corpus stats a broadcast one-row
    aggregate, so the plan must carry NO hash-partitioned exchange and
    NO join of the postings (the pre-r6 assertion — a broadcast df
    join — is subsumed: there is no df join at all now; the only
    exchanges allowed are the read-spread round-robin and the final
    range sort)."""
    from job_searchengine_project_spark.operators.fulltext import bm25_scores
    from job_searchengine_project_spark.plans.explain import plan_str

    plan = plan_str(bm25_scores(spark, SF))
    assert "SortMergeJoin" not in plan
    assert "hashpartitioning" not in plan, plan


def test_lsh_candidate_join_is_hash_not_cartesian(spark):
    """The multi-table LSH self-join must key on (table, bucket) —
    an equality hash join, never a cartesian/nested-loop pair scan."""
    from job_searchengine_project_spark.operators.similarity import ann_lsh_bucketed
    from job_searchengine_project_spark.plans.explain import plan_str

    plan = plan_str(ann_lsh_bucketed(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_stored_fields_scan_prunes_buckets(spark, tmp_path):
    """attach_stored_fields must reach the docstore with literal
    sbucket partition filters and url filters, never a full scan."""
    from job_searchengine_project_spark.corpus import generate_webpages
    from job_searchengine_project_spark.index.build import build_index
    from job_searchengine_project_spark.plans.explain import plan_str
    from job_searchengine_project_spark.search.distributed import search_distributed

    out = str(tmp_path / "idx_prune")
    pages = generate_webpages(spark, n_docs=120, seed=9)
    build_index(spark, pages, out, target_postings_per_salt=50, term_buckets=8)
    df = search_distributed(spark, out, ["spark"], k=3, with_fields=True)
    plan = plan_str(df)
    assert "sbucket" in plan  # partition filter reached the stored scan
    assert df.count() == 3


def test_distributed_agg_has_partial_aggregate(spark, tmp_path):
    """The distributed terms/histogram aggregations must show
    Catalyst's two-phase aggregate (map-side partial before the key
    exchange) — that partial IS the per-shard agg at cluster scale."""
    from job_searchengine_project_spark.corpus import generate_webpages
    from job_searchengine_project_spark.index.build import build_index
    from job_searchengine_project_spark.index.sharded import (
        aggregate_histogram_sharded,
        aggregate_terms_sharded,
        build_sharded_segments,
    )
    from job_searchengine_project_spark.plans.explain import plan_str

    pages = generate_webpages(spark, n_docs=60, vocab_size=120, seed=5).withColumn(
        "n_chars", F.length("text")
    )
    out = str(tmp_path / "idx_agg")
    build_index(spark, pages, out, term_buckets=8, doc_values=["n_chars"])
    build_sharded_segments(spark, out, n_shards=2)
    for df in (
        aggregate_terms_sharded(spark, out, "n_chars", size=5),
        aggregate_histogram_sharded(spark, out, "n_chars", 100),
    ):
        p = plan_str(df)
        assert "partial" in p.lower(), p  # HashAggregate(partial_...)
        assert "CartesianProduct" not in p


def test_shard_dv_slice_read_is_value_pruned(spark, tmp_path):
    """A shard kernel's doc-values filter read must prune on row-group
    statistics: the slice is value-sorted, so a selective bound reads
    a strict subset of the row groups."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from job_searchengine_project_spark.corpus import generate_webpages
    from job_searchengine_project_spark.index.build import build_index
    from job_searchengine_project_spark.index.sharded import (
        SHARD_DV_DIR,
        build_sharded_segments,
    )

    pages = generate_webpages(spark, n_docs=400, vocab_size=300, seed=7).withColumn(
        "n_chars", F.length("text")
    )
    out = str(tmp_path / "idx_dvp")
    build_index(spark, pages, out, term_buckets=8, doc_values=["n_chars"])
    # tiny row groups so statistics pruning is observable
    import os

    shard_dir = os.path.join(out, SHARD_DV_DIR, "n_chars")
    build_sharded_segments(spark, out, n_shards=2)
    part = os.path.join(shard_dir, "shard=0")
    files = [f for f in os.listdir(part) if f.endswith(".parquet")]
    assert files
    # rewrite the slice with 32-row row groups (keeps value order)
    for fname in files:
        fp = os.path.join(part, fname)
        tbl = pq.read_table(fp)
        pq.write_table(tbl, fp, row_group_size=32)
    ds = pads.dataset(part)
    frag = next(iter(ds.get_fragments()))
    n_total = sum(1 for _ in frag.split_by_row_group())
    lo = int(pq.read_table(part).column("n_chars")[0].as_py())
    n_pruned = sum(
        1 for _ in frag.split_by_row_group(pads.field("n_chars") <= lo)
    )
    assert n_total > 3 and n_pruned < n_total, (n_pruned, n_total)


def test_bool_hit_set_algebra_is_join_shaped(spark, tmp_path):
    """The distributed endpoint's exact-total hit-set plan: semi/anti
    joins and a countDistinct gate — no cartesian product, and the
    msm clause-count aggregate is two-phase (partial before merge)."""
    import json
    import os

    from job_searchengine_project_spark.corpus import generate_webpages
    from job_searchengine_project_spark.index.build import build_index
    from job_searchengine_project_spark.index.sharded import build_sharded_segments
    from job_searchengine_project_spark.plans.explain import plan_str
    from job_searchengine_project_spark.search.cluster import (
        bool_match_docs_sharded,
    )

    pages = generate_webpages(spark, n_docs=80, vocab_size=150, seed=3).withColumn(
        "n_chars", F.length("text")
    )
    out = str(tmp_path / "idx_boolplan")
    build_index(spark, pages, out, term_buckets=8, doc_values=["n_chars"])
    build_sharded_segments(spark, out, n_shards=2)
    with open(os.path.join(out, "stats.json")) as f:
        stats = json.load(f)
    scope = bool_match_docs_sharded(
        spark, out, stats,
        {"must": ["spark"], "should": ["데이터엔지니어", "개발자"],
         "must_not": ["dup"], "filter": []},
        [{"col": "n_chars", "gte": 100}], [], msm=1,
    )
    p = plan_str(scope)
    assert "CartesianProduct" not in p
    assert "LeftSemi" in p and "LeftAnti" in p, p
    assert "partial" in p.lower(), p  # two-phase clause-count aggregate


def test_sharded_fielded_plan_shape(spark, tmp_path):
    """The distributed fielded paths stay join/shuffle-shaped: the
    union scan pushes the per-field term filters into each sub-index's
    parquet scan, there is exactly ONE exchange (the colocate-by-shard
    repartition) before the kernels, and no cartesian/nested-loop
    joins anywhere; sub-agg nesting adds joins, never a second
    bucket-level shuffle stage."""
    from pyspark.sql import functions as F

    from job_searchengine_project_spark.corpus import generate_webpages
    from job_searchengine_project_spark.index.fielded import build_fielded_index
    from job_searchengine_project_spark.index.sharded import (
        aggregate_terms_subagg_sharded,
        build_sharded_segments,
    )
    from job_searchengine_project_spark.index.sharded_fielded import (
        build_sharded_fielded,
        search_sharded_multi,
    )
    from job_searchengine_project_spark.plans.explain import plan_str

    out = str(tmp_path / "fielded_plan")
    pages = generate_webpages(spark, n_docs=120, seed=21).select(
        "url",
        F.substring("text", 1, 40).alias("title"),
        F.col("text").alias("body"),
    )
    build_fielded_index(
        spark, pages, out, fields={"title": "morph", "body": "morph"},
        target_postings_per_salt=50, term_buckets=8,
    )
    build_sharded_fielded(spark, out, n_shards=3)
    df = search_sharded_multi(spark, out, "spark", k=5)
    plan = plan_str(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the union scan itself (pre-kernel): per-field term filters reach
    # the parquet scans (the returned df is the post-merge tiny join,
    # so the scan plan is asserted on the _field_scan stage directly)
    from job_searchengine_project_spark.index.sharded_fielded import _field_scan

    segs, df_map, _rng = _field_scan(
        spark, out, {"title": ["spark"], "body": ["spark"]}
    )
    assert df_map  # global per-(field, term) df resolved
    splan = plan_str(segs)
    assert "PushedFilters" in splan and "term" in splan

    # sub-agg plan: partial aggregate present, single agg exchange
    out2 = str(tmp_path / "dv_plan")
    dv_pages = generate_webpages(spark, n_docs=120, seed=22).withColumn(
        "n_chars", F.length("text")
    ).withColumn("site", F.substring("url", 9, 6))
    from job_searchengine_project_spark.index.build import build_index

    build_index(spark, dv_pages, out2, target_postings_per_salt=50,
                term_buckets=8, doc_values=["n_chars", "site"])
    build_sharded_segments(spark, out2, n_shards=3)
    agg = aggregate_terms_subagg_sharded(
        spark, out2, "site",
        {"a": {"avg": {"field": "n_chars"}},
         "c": {"cardinality": {"field": "n_chars"}}},
        size=5,
    )
    aplan = plan_str(agg)
    assert "partial" in aplan.lower()  # map-side combine before exchange
    assert "CartesianProduct" not in aplan
