"""spark-submit entry points (north_rule: `spark-submit --py-files`).

Usage (local or cluster — the master comes from spark-submit):

  # package the library for executors
  cd /root/repo && zip -qr /tmp/jse.zip job_searchengine_project_spark

  spark-submit --py-files /tmp/jse.zip -- \
      jobs_main.py build --input /path/pages_parquet --output /path/index \
      [--analyzer morph] [--resume] [--use-extractor]

  spark-submit --py-files /tmp/jse.zip -- \
      jobs_main.py gen --output /path/pages_parquet --n-docs 100000

  spark-submit --py-files /tmp/jse.zip -- \
      jobs_main.py search --index /path/index --terms spark,kafka --k 10

On a cluster, `build` is the whole reference pipeline (stages 2-6 of
SURVEY.md §3.2) as one lineage-tracked DAG; `--resume` resumes from
the last committed stage after a kill.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("job_searchengine_project_spark").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def cmd_gen(args) -> None:
    from job_searchengine_project_spark.corpus import generate_webpages

    spark = _spark()
    generate_webpages(
        spark, n_docs=args.n_docs, vocab_size=args.vocab_size, seed=args.seed
    ).write.mode("overwrite").parquet(args.output)
    print(json.dumps({"generated": args.n_docs, "path": args.output}))


def cmd_build(args) -> None:
    from job_searchengine_project_spark.index.build import build_index

    spark = _spark()
    pages = spark.read.parquet(args.input)
    res = build_index(
        spark,
        pages,
        args.output,
        analyzer=args.analyzer,
        use_extractor=args.use_extractor,
        resume=args.resume,
    )
    print(
        json.dumps(
            {
                "n_docs": res.n_docs,
                "n_terms": res.n_terms,
                "total_postings": res.total_postings,
                "stages_run": res.stages_run,
                "stages_skipped": res.stages_skipped,
                "out_dir": res.out_dir,
            }
        )
    )


def cmd_search(args) -> None:
    from job_searchengine_project_spark.search.engine import SearchEngine

    eng = SearchEngine(args.index)
    hits = eng.search(args.terms.split(","), k=args.k)
    print(
        json.dumps(
            [{"doc_id": h.doc_id, "score": h.score, "url": h.url} for h in hits],
            ensure_ascii=False,
        )
    )


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="job_searchengine_project_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="generate the synthetic web-page corpus")
    g.add_argument("--output", required=True)
    g.add_argument("--n-docs", type=int, default=100_000)
    g.add_argument("--vocab-size", type=int, default=20_000)
    g.add_argument("--seed", type=int, default=42)
    g.set_defaults(fn=cmd_gen)

    b = sub.add_parser("build", help="build the inverted-index segments")
    b.add_argument("--input", required=True, help="web-page parquet (url, warc_ts, html, text, lang)")
    b.add_argument("--output", required=True, help="index directory")
    b.add_argument("--analyzer", default="morph", choices=["morph", "2gram"])
    b.add_argument("--use-extractor", action="store_true", help="extract text from html (byte-identical UDF)")
    b.add_argument("--resume", action="store_true", help="resume from last committed stage")
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search", help="BM25 top-k over a built index")
    s.add_argument("--index", required=True)
    s.add_argument("--terms", required=True, help="comma-separated query terms")
    s.add_argument("--k", type=int, default=10)
    s.set_defaults(fn=cmd_search)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main(sys.argv[1:])
