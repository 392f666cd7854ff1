"""job_searchengine_project_spark — a PySpark-native full-text search engine.

A from-scratch rebuild of the *capabilities* of
sy0218/Job_SearchEngine_ProJect (a Selenium -> Kafka -> HDFS ->
Elasticsearch job-posting search pipeline), re-expressed Spark-first:

- input: a Common-Crawl-style web-page table
  ``(url string, warc_ts timestamp, html binary, text string, lang string)``
- build: vectorized extract/tokenize (Arrow pandas UDFs), term-frequency
  map-side aggregation, salted repartition-by-term posting-list merge with
  explicit head-term skew splitting, delta + varbyte compressed block-max
  segments, per-partition lineage/metrics for checkpoint-resumable rebuilds
- query: BM25 (k1=1.2, b=0.75) top-k via block-max WAND over the
  compressed segments, rank-identical to a brute-force DataFrame oracle

The reference's inverted index is delegated to Elasticsearch/Lucene
(reference: schema/es/es.sh:16-47); this package *is* that component,
built on Spark DataFrames + numpy kernels.
"""

__version__ = "0.1.0"

BM25_K1 = 1.2
BM25_B = 0.75
