"""Round-6 optimization equivalence gates.

Every optimization that changed an operator's internals is pinned
here against the form it replaced:

- grouped segment encoding must be BYTE-identical to per-group
  encoding (the segment files are a durable format);
- the vectorized Arrow tokenize kernel must emit exactly the pandas
  UDF's (terms, doclen) contract;
- the numpy left-fold dot/norm kernels must be BIT-identical to the
  interpreted expression forms (scores feed rounded oracles);
- the batched stored-field read must return what per-hit point reads
  returned.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def test_grouped_encoder_byte_identical_to_per_group():
    from job_searchengine_project_spark.index import codec

    rng = np.random.default_rng(7)
    for _ in range(10):
        n_groups = int(rng.integers(1, 30))
        sizes = rng.integers(1, 300, size=n_groups)
        starts = np.zeros(n_groups, dtype=np.int64)
        np.cumsum(sizes[:-1], out=starts[1:])
        ends = starts + sizes
        docs = np.concatenate(
            [np.sort(rng.choice(10**6, size=s, replace=False)) for s in sizes]
        ).astype(np.int64)
        tfs = rng.integers(1, 40, size=docs.size).astype(np.int64)
        tfn = rng.random(docs.size)
        bs = int(rng.choice([4, 32, 128]))
        grouped = codec.encode_postings_grouped(
            starts, ends, docs, tfs, tfn, block_size=bs
        )
        for g in range(n_groups):
            s, e = starts[g], ends[g]
            ref = codec.encode_postings(
                docs[s:e], tfs[s:e], tfn[s:e], block_size=bs
            )
            got = grouped[g]
            assert got.doc_blob == ref.doc_blob
            assert got.tf_blob == ref.tf_blob
            assert got.count == ref.count and got.first_doc == ref.first_doc
            for f in (
                "block_n", "block_last_doc", "block_doc_bytes",
                "block_tf_bytes", "block_max_tfnorm",
            ):
                assert np.array_equal(getattr(got, f), getattr(ref, f)), f
            d, t = codec.decode_postings(got)
            assert np.array_equal(d, docs[s:e]) and np.array_equal(t, tfs[s:e])


def test_arrow_tokenize_kernel_matches_pandas_udf(spark):
    from job_searchengine_project_spark.corpus import generate_webpages
    from job_searchengine_project_spark.functions.tokenize import (
        make_term_freqs_udf,
        term_freqs_arrow_morph,
    )

    pages = generate_webpages(spark, n_docs=400, vocab_size=300, seed=11)
    extra = spark.createDataFrame(
        [
            ("u-ko", "한국어 테스트 spark SPARK spark/data  x 경우 ab"),
            ("u-empty", ""),
            ("u-short", "a b c"),
            ("u-stop", "경우 사항 이상"),
        ],
        "url string, text string",
    )
    src = pages.select("url", "text").unionByName(extra)
    tf_udf = make_term_freqs_udf("morph")
    old = (
        src.select("url", tf_udf(F.col("text")).alias("terms"))
        .withColumn(
            "doclen",
            F.aggregate(F.col("terms"), F.lit(0), lambda a, x: a + x["tf"]),
        )
    )
    new = src.mapInArrow(
        term_freqs_arrow_morph,
        schema="url string, terms array<struct<term:string,tf:int>>, doclen int",
    )
    o = {r["url"]: (r["terms"], r["doclen"]) for r in old.collect()}
    n = {r["url"]: (r["terms"], r["doclen"]) for r in new.collect()}
    assert o == n


def test_fold_kernels_bit_identical_to_expressions(spark):
    from job_searchengine_project_spark.operators.similarity import (
        _bucket_array,
        _dot,
        _dot_udf,
        _norm,
        _norm_udf,
        _plane_signs,
        HI_PLANES,
        HI_TABLES,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    a = emb.select("vec_id", F.col("embedding").alias("va"))
    b = emb.select(
        (F.col("vec_id") + 1).alias("vec_id"), F.col("embedding").alias("vb")
    )
    j = a.join(b, "vec_id")
    row = j.select(
        F.min(
            _dot(F.col("va"), F.col("vb")) == _dot_udf(F.col("va"), F.col("vb"))
        ).alias("dot_eq"),
        F.min(_norm(F.col("va")) == _norm_udf(F.col("va"))).alias("norm_eq"),
    ).collect()[0]
    assert row["dot_eq"] and row["norm_eq"]

    # bucket strings: kernel vs the interpreted literal-matrix form
    mat = F.array(
        *[
            F.array(
                *[
                    F.array(*[F.lit(float(s)) for s in _plane_signs(t, p)])
                    for p in range(HI_PLANES)
                ]
            )
            for t in range(HI_TABLES)
        ]
    )

    def _bit(plane):
        terms = F.zip_with(
            F.col("embedding"), plane, lambda x, s: x.cast("double") * s
        )
        return (
            (F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x) > 0)
            .cast("int")
            .cast("string")
        )

    old_buckets = F.transform(
        mat, lambda pa_: F.array_join(F.transform(pa_, _bit), "")
    )
    eq = emb.select(
        F.min(
            old_buckets == _bucket_array(F.col("embedding"), HI_PLANES, HI_TABLES)
        ).alias("eq")
    ).collect()[0]["eq"]
    assert eq


def test_fields_of_many_matches_fields_of(spark, tmp_path):
    from job_searchengine_project_spark.corpus import generate_webpages
    from job_searchengine_project_spark.index.build import build_index
    from job_searchengine_project_spark.search.engine import SearchEngine

    out = str(tmp_path / "idx")
    pages = generate_webpages(spark, n_docs=300, vocab_size=200, seed=3)
    build_index(spark, pages, out, analyzer="morph")
    eng = SearchEngine(out)
    doc_ids = [h.doc_id for h in eng.search(["spark", "data"], k=50)]
    assert doc_ids
    batched = eng.fields_of_many(doc_ids)
    for d in doc_ids:
        assert batched[d] == eng.fields_of(d)
