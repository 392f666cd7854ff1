"""Reference-pattern relational operators over the TPC-H-ish tables.

Each entry re-expresses one operator family from the reference
(SURVEY.md §2: joins J1-J3, aggregations A2/A5, sorts O1/O3, set ops
U1/U3, predicates P10-P12, scalar fns F1-F9) on neutral test data,
with the ANSI-SQL oracle alongside. Everything is built-in Catalyst
operators — broadcast/anti/semi joins, windows, map-side-combined
aggregations — chosen exactly as one would at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# J1 — dedup anti-join (new msgids vs seen set; collector.py:149-187)
def anti_join_new_docs(spark, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seen = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.sha2(F.col("text"), 256).alias("h")
    )
    return (
        docs.withColumn("h", F.sha2(F.col("text"), 256))
        .join(seen, "h", "left_anti")
        .select("doc_id")
        .orderBy("doc_id")
    )


ANTI_JOIN_SQL = """
SELECT doc_id FROM documents d
WHERE NOT EXISTS (
  SELECT 1 FROM documents s WHERE s.doc_id % 3 = 0 AND sha256(s.text) = sha256(d.text)
)
ORDER BY doc_id
"""


# J2 — enrichment join + group-concat (OCR merge; warehouse.py:104-133)
def enrichment_join_concat(spark, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # decide the output keys on NARROW columns first: the result is
    # the 100 smallest orderkeys having lineitems, so a key-only
    # semi-join + top-100 picks them, and the group-concat then runs
    # over just those keys' rows via a broadcast join — instead of
    # concat-aggregating every order's lineitems and throwing away
    # all but 100 groups
    keys = (
        orders.select("o_orderkey")
        .join(
            lineitem.select(F.col("l_orderkey").alias("o_orderkey")),
            "o_orderkey",
            "left_semi",
        )
        .orderBy("o_orderkey")
        .limit(100)
    )
    enriched = (
        F.broadcast(keys)
        .join(lineitem, F.col("o_orderkey") == lineitem.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list(F.col("l_partkey").cast("string"))), " "
            ).alias("parts_concat"),
            F.count("*").alias("n_items"),
        )
    )
    return enriched.orderBy("o_orderkey").limit(100)


ENRICH_SQL = """
SELECT o_orderkey,
       string_agg(l_partkey::VARCHAR, ' ' ORDER BY l_partkey::VARCHAR) AS parts_concat,
       count(*) AS n_items
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey ORDER BY o_orderkey LIMIT 100
"""


# J3 — semi-join (already-done check; ocr.py:98-101)
def semi_join_done(spark, sf_dir: str) -> DataFrame:
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        supplier.join(
            lineitem.select("l_suppkey").distinct(),
            supplier.s_suppkey == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


SEMI_JOIN_SQL = """
SELECT s_suppkey, s_name FROM supplier
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
ORDER BY s_suppkey
"""


# A2/A5 — batch counters / reconciliation (collector.py:165-192)
def batch_counters(spark, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("event_type")
    )


BATCH_COUNTERS_SQL = """
SELECT event_type, count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 4) AS total_value
FROM events GROUP BY event_type ORDER BY event_type
"""


# O1 — work-queue ordering: oldest pending item per stage
# (ORDER BY txid LIMIT 1; warehouse/conf/warehouse.properties:6)
def work_queue_oldest(spark, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("event_type").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", "event_id", "ts")
        .orderBy("event_type")
    )


WORK_QUEUE_SQL = """
SELECT event_type, event_id, ts FROM (
  SELECT event_type, event_id, ts,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1 ORDER BY event_type
"""


# top-k per group (query-time top-k analog, O3)
def topk_per_group(spark, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_orderpriority", "rank", "o_orderkey", F.round("o_totalprice", 2).alias("price"))
        .orderBy("o_orderpriority", "rank")
    )


TOPK_GROUP_SQL = """
SELECT o_orderpriority, rank, o_orderkey, round(o_totalprice, 2) AS price FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders
) WHERE rank <= 3 ORDER BY o_orderpriority, rank
"""


# P10 — deterministic residue-class work claim (MOD(txid, n) = p)
def mod_partition_claim(spark, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        events.filter(F.pmod(F.col("event_id"), F.lit(8)) == 3)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type")
    )


MOD_CLAIM_SQL = """
SELECT event_type, count(*) AS n FROM events
WHERE event_id % 8 = 3 GROUP BY event_type ORDER BY event_type
"""


# U3 — union of per-source streams into one table
def union_sources(spark, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = docs.filter(F.col("source") == "src0").select("doc_id", "source")
    b = docs.filter(F.col("lang") == "en").select("doc_id", "source")
    return a.union(b).distinct().orderBy("doc_id")


UNION_SQL = """
SELECT DISTINCT doc_id, source FROM (
  SELECT doc_id, source FROM documents WHERE source = 'src0'
  UNION ALL
  SELECT doc_id, source FROM documents WHERE lang = 'en'
) ORDER BY doc_id
"""


# P11 — path-prefix stage routing (LIKE views; psql_create.psql:23-35)
def stage_routing(spark, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.filter(F.col("source").startswith("src1"))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .orderBy("source")
    )


STAGE_ROUTING_SQL = """
SELECT source, count(*) AS n FROM documents
WHERE source LIKE 'src1%' GROUP BY source ORDER BY source
"""


# F1/F2 — sha256 identity derivation (msgid)
def msgid_derivation(spark, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.sha2(F.concat(F.col("source"), F.col("text")), 256).alias("msgid"),
    ).orderBy("doc_id")


MSGID_SQL = """
SELECT doc_id, sha256(source || text) AS msgid FROM documents ORDER BY doc_id
"""


# TPC-H Q1-style pricing summary (aggregation showcase)
def pricing_summary(spark, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
"""


# broadcast dim join — revenue by nation (S10/J-pattern at scale)
def revenue_by_nation(spark, sf_dir: str) -> DataFrame:
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"), F.count("*").alias("n_orders"))
        .orderBy("n_name")
    )


REVENUE_SQL = """
SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


QUERIES = {
    "anti_join_new_docs": (anti_join_new_docs, ANTI_JOIN_SQL),
    "enrichment_join_concat": (enrichment_join_concat, ENRICH_SQL),
    "semi_join_done": (semi_join_done, SEMI_JOIN_SQL),
    "batch_counters": (batch_counters, BATCH_COUNTERS_SQL),
    "work_queue_oldest": (work_queue_oldest, WORK_QUEUE_SQL),
    "topk_per_group": (topk_per_group, TOPK_GROUP_SQL),
    "mod_partition_claim": (mod_partition_claim, MOD_CLAIM_SQL),
    "union_sources": (union_sources, UNION_SQL),
    "stage_routing": (stage_routing, STAGE_ROUTING_SQL),
    "msgid_derivation": (msgid_derivation, MSGID_SQL),
    "pricing_summary": (pricing_summary, PRICING_SQL),
    "revenue_by_nation": (revenue_by_nation, REVENUE_SQL),
}


# sessionization — lag + gap-flag cumulative sum (the classic
# event-stream window composition; batch twin of session_window)
def sessionize(spark, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ: go through unix seconds via an instant cast
    # (TZ-cancelling — the same wall time converts back out)
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    sess = (
        events.withColumn("new_sess", F.when(gap.isNull() | (gap > 3600), 1).otherwise(0))
        .withColumn("session_no", F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ))
    )
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .orderBy("user_id", "session_no")
    )


SESSIONIZE_SQL = """
WITH g AS (
  SELECT user_id, event_id, value, ts,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                   OR epoch(ts) - lag(epoch(ts)) OVER w > 3600
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, event_id, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING)::BIGINT AS session_no
  FROM g
)
SELECT user_id, session_no, count(*) AS n_events,
       round(sum(value), 4) AS session_value
FROM s GROUP BY user_id, session_no ORDER BY user_id, session_no
"""


# the composed training-data gate: quality filter -> language filter
# -> exact-dup drop, in one declarative plan (what a 100 TB curation
# pipeline runs before tokenization)
def training_corpus_filter(spark, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    digit_ratio = (
        F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))
    ) / F.length("text")
    gated = docs.filter(
        (n_tok >= 20) & (digit_ratio < 0.3) & (F.col("lang").isin("en", "de"))
    )
    w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    return (
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", F.size(F.split(F.col("text"), " ")).alias("n_tokens"))
        .orderBy("doc_id")
    )


TRAINING_FILTER_SQL = """
WITH gated AS (
  SELECT doc_id, lang, text,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
  WHERE len(string_split(text, ' ')) >= 20
    AND (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE / length(text) < 0.3
    AND lang IN ('en', 'de')
),
dedup AS (
  SELECT doc_id, lang, n_tokens,
         row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
  FROM gated
)
SELECT doc_id, lang, n_tokens FROM dedup WHERE rn = 1 ORDER BY doc_id
"""

QUERIES["sessionize"] = (sessionize, SESSIONIZE_SQL)
QUERIES["training_corpus_filter"] = (training_corpus_filter, TRAINING_FILTER_SQL)


# exact percentiles per group (analytic agg; Spark `percentile` and
# DuckDB `quantile_cont` share the interpolated definition)
def value_percentiles(spark, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
            F.round(F.min("value"), 4).alias("vmin"),
            F.round(F.max("value"), 4).alias("vmax"),
        )
        .orderBy("event_type")
    )


PERCENTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90,
       round(min(value), 4) AS vmin,
       round(max(value), 4) AS vmax
FROM events GROUP BY event_type ORDER BY event_type
"""


# rollup: per-(type, user-bucket) counts with subtotals + grand total
def rollup_counts(spark, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    ub = F.pmod(F.col("user_id"), F.lit(4)).cast("int").alias("user_bucket")
    return (
        events.select("event_type", ub)
        .rollup("event_type", "user_bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "user_bucket")
    )


ROLLUP_SQL = """
SELECT event_type, (user_id % 4)::INT AS user_bucket, count(*) AS n
FROM events GROUP BY ROLLUP (event_type, (user_id % 4)::INT)
ORDER BY event_type, user_bucket
"""

QUERIES["value_percentiles"] = (value_percentiles, PERCENTILES_SQL)
QUERIES["rollup_counts"] = (rollup_counts, ROLLUP_SQL)
