"""S5-S8 source/sink coverage: gzip NDJSON round-trip, binary scan.

The reference's at-rest formats are NDJSON (consumer/consumer.py:193-198)
and gzip-concatenated NDJSON on HDFS (hadoop_upload.sh:35-55); Spark's
text/json sources are codec-transparent and the compaction batch
(LINE_LIMIT=37) becomes a repartition before write.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F


def test_gzip_ndjson_roundtrip(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "ndjson_gz")
    # dict -> NDJSON line (job_class._dict_to_ndjson) == to_json per row;
    # the merge+gzip daemon == repartition(2) + gzip codec
    (
        docs.select(F.to_json(F.struct("doc_id", "text", "lang", "source")).alias("value"))
        .repartition(2)
        .write.mode("overwrite")
        .option("compression", "gzip")
        .text(out)
    )
    assert glob.glob(f"{out}/*.gz"), "expected gzip part files"
    back = (
        spark.read.text(out)
        .select(
            F.from_json(
                "value", "doc_id long, text string, lang string, source string"
            ).alias("r")
        )
        .select("r.*")
    )
    a = sorted(tuple(r) for r in docs.select("doc_id", "text", "lang", "source").collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_binary_file_scan(spark):
    """S7/S12: opaque byte scan + content-hash identity, JVM-side."""
    df = (
        spark.read.format("binaryFile")
        .load("/root/testdata/sf0.001/region.parquet")
        .select("path", "length", F.sha2("content", 256).alias("h"))
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["length"] > 0 and len(rows[0]["h"]) == 64


def test_jdbc_work_queue_call_shape(spark, monkeypatch):
    """Docker-less JDBC contract: no database exists here, so assert
    the exact partitioned-read options the reader is built with — a
    single-connection read (no partitionColumn) would serialize the
    whole queue scan through one executor."""
    import pyspark.sql.readwriter as rw

    from job_searchengine_project_spark.sources.jdbc import read_work_queue

    captured: dict[str, str] = {}
    real_option = rw.DataFrameReader.option

    def spy_option(self, key, value):
        captured[key] = str(value)
        return real_option(self, key, value)

    monkeypatch.setattr(rw.DataFrameReader, "option", spy_option)
    monkeypatch.setattr(rw.DataFrameReader, "load", lambda self, *a, **k: None)
    read_work_queue(spark, "jdbc:postgresql://db:5432/job", num_partitions=16)
    assert captured["url"] == "jdbc:postgresql://db:5432/job"
    assert captured["dbtable"] == "job.crawl_queue"
    assert captured["partitionColumn"] == "txid"
    assert captured["numPartitions"] == "16"
    assert int(captured["lowerBound"]) < int(captured["upperBound"])
    assert captured["driver"] == "org.postgresql.Driver"
