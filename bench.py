"""Benchmark: index-build throughput at two parallelism levels,
BM25 top-10 query p50, and headline operator timings.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "build": {"docs_per_sec_N": ..., "docs_per_sec_4N": ...,
             "scaling_efficiency": ...},
   "query_p50_ms": ...}

Scaling evidence (north_rule): the same build job runs on the same
input at two local parallelism levels (local[N] and local[4N],
N = SPARK_GRAFT_CPUS/4); efficiency = thr(4N) / (4 * thr(N)).
A real cluster isn't available in this sandbox — two core counts on
one box is the sanctioned stand-in (see BENCH.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_SMALL = max(2, CPUS // 4)
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))
QUERY_RUNS = int(os.environ.get("SPARK_GRAFT_QUERY_RUNS", "100"))

HEADLINE = [
    "bm25_top10",
    "wand_bm25_top10",
    "term_df_top20",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "lang_id",
    "quality_score",
    "pricing_summary",
    "enrichment_join_concat",
    "event_window_counts",
]


def _session(cores: int):
    from job_searchengine_project_spark.session import get_spark

    return get_spark(app_name=f"bench_{cores}", master=f"local[{cores}]")


def _build_once(cores: int, out_dir: str) -> float:
    """Generate the synthetic corpus + build the index; return docs/sec.

    Corpus generation is included in the measured window: at 100 TB the
    scan is part of the build, and generation here is the scan stand-in.
    """
    from job_searchengine_project_spark.corpus import generate_webpages
    from job_searchengine_project_spark.index.build import build_index

    spark = _session(cores)
    try:
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        pages = generate_webpages(spark, n_docs=BENCH_DOCS, vocab_size=5000, seed=42)
        res = build_index(spark, pages, out_dir, analyzer="morph")
        dt = time.time() - t0
        assert res.n_docs == BENCH_DOCS
        return BENCH_DOCS / dt
    finally:
        spark.stop()


def main() -> None:
    total_t0 = time.time()
    idx_dir = os.path.join(tempfile.gettempdir(), "jse_bench_idx")

    thr_small = _build_once(N_SMALL, idx_dir)
    thr_big = _build_once(CPUS, idx_dir)
    efficiency = thr_big / ((CPUS / N_SMALL) * thr_small)

    # query p50 over the built index (warm, driver-side WAND)
    from job_searchengine_project_spark.corpus import HEAD_TERMS
    from job_searchengine_project_spark.search.engine import SearchEngine

    eng = SearchEngine(idx_dir)
    eng.search(list(HEAD_TERMS), k=10, with_urls=False)  # warm caches
    lat = []
    for i in range(QUERY_RUNS):
        q = [HEAD_TERMS[i % len(HEAD_TERMS)], HEAD_TERMS[(i + 1) % len(HEAD_TERMS)]]
        t0 = time.time()
        eng.search(q, k=10, with_urls=False)
        lat.append(time.time() - t0)
    lat.sort()
    p50_ms = 1000.0 * lat[len(lat) // 2]

    # headline operator queries at SF_DIR
    import __spark_entry__ as entrymod

    spark = _session(CPUS)
    qtimes: dict[str, float] = {}
    try:
        qs = entrymod.queries()
        for name in HEADLINE:
            t0 = time.time()
            qs[name](spark, SF_DIR).collect()
            qtimes[name] = round(time.time() - t0, 3)
    finally:
        spark.stop()

    out = {
        "metric": "index-build docs/sec at N and 4N cores + BM25 top-10 p50",
        "value": round(time.time() - total_t0, 2),
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "build": {
            "bench_docs": BENCH_DOCS,
            "cores_small": N_SMALL,
            "cores_big": CPUS,
            "docs_per_sec_N": round(thr_small, 1),
            "docs_per_sec_4N": round(thr_big, 1),
            "scaling_efficiency": round(efficiency, 3),
        },
        "query_p50_ms": round(p50_ms, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
