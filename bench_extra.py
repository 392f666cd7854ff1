"""Round-6 optimization harness (bench.py is FROZEN — this file holds
the extra measurements the optimization round needs):

  python bench_extra.py queries [names...]   time headline queries, min over ROUNDS
  python bench_extra.py plans [names...]     dump .explain("formatted") per query
  python bench_extra.py build [n_docs]       time one build at SPARK_GRAFT_CPUS cores

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 — the driver's
measured scale), SPARK_GRAFT_CPUS, BENCH_EXTRA_ROUNDS (default 3).
Query timing matches bench.py methodology exactly: qs[name](spark,
SF_DIR).collect() per round, min across rounds (first round pays any
index-build cold cost, so min == warm time).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROUNDS = int(os.environ.get("BENCH_EXTRA_ROUNDS", "3"))

HEADLINE = [
    "bm25_top10", "wand_bm25_top10", "wand_2gram_top10", "phrase_2gram_top10",
    "term_df_top20", "bool_query_top10", "fielded_search_top10",
    "upsert_purge_top10", "fuzzy_top10", "fuzzy_sharded_top10",
    "range_filter_top10", "bool_sharded_filter_top10", "terms_agg",
    "terms_agg_sharded", "terms_subagg_sharded", "percentiles_agg_sharded",
    "phrase_slop_top10", "prefix_top10", "multi_field_sharded_top10",
    "highlight_fragments", "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "ann_cosine_topk", "ann_lsh_hi_pairs", "ann_ivf_topk", "lang_id",
    "quality_score", "pricing_summary", "enrichment_join_concat",
    "event_window_counts",
]


def _session():
    from job_searchengine_project_spark.session import get_spark

    return get_spark(app_name="bench_extra", master=f"local[{CPUS}]")


def run_queries(names: list[str]) -> None:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = _session()
    rounds: list[dict[str, float]] = []
    try:
        for r in range(ROUNDS):
            rt: dict[str, float] = {}
            for name in names:
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.time()
                qs[name](spark, SF_DIR).collect()
                rt[name] = round(time.time() - t0, 3)
                spark.sparkContext.setJobDescription(None)
            rounds.append(rt)
            print(json.dumps({"round": r, "times": rt}), flush=True)
    finally:
        spark.stop()
    mins = {n: min(rt[n] for rt in rounds) for n in names}
    print(json.dumps({"sf": SF_DIR, "min": mins, "total_min": round(sum(mins.values()), 2)}))


def dump_plans(names: list[str], outdir: str) -> None:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    os.makedirs(outdir, exist_ok=True)
    spark = _session()
    try:
        for name in names:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
                f.write(plan)
            print("wrote", name)
    finally:
        spark.stop()


def run_build(n_docs: int) -> None:
    import shutil
    import tempfile

    from job_searchengine_project_spark.corpus import generate_webpages
    from job_searchengine_project_spark.index.build import build_index

    corpus = os.path.join(tempfile.gettempdir(), f"jse_bench_corpus_{n_docs}")
    spark = _session()
    try:
        if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
            generate_webpages(
                spark, n_docs=n_docs, vocab_size=max(2000, n_docs // 5), seed=42
            ).write.mode("overwrite").parquet(corpus)
        pages = spark.read.parquet(corpus)
        out = os.path.join(tempfile.gettempdir(), "jse_extra_idx")
        warm = out + "_warm"
        shutil.rmtree(warm, ignore_errors=True)
        build_index(spark, pages.limit(2000), warm, analyzer="morph")
        shutil.rmtree(warm, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        build_index(spark, pages, out, analyzer="morph")
        dt = time.time() - t0
        print(json.dumps({"build_docs": n_docs, "cores": CPUS,
                          "sec": round(dt, 2),
                          "docs_per_sec": round(n_docs / dt, 1)}))
    finally:
        spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "queries"
    rest = sys.argv[2:]
    if cmd == "queries":
        run_queries(rest or HEADLINE)
    elif cmd == "plans":
        dump_plans(rest or HEADLINE, os.path.join(REPO, "plans", "r06", "dump"))
    elif cmd == "build":
        run_build(int(rest[0]) if rest else 300000)
    else:
        raise SystemExit(f"unknown command {cmd!r}")
