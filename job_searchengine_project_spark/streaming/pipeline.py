"""Structured Streaming variants of the reference's micro-batch daemons.

The reference is a hand-rolled Kafka micro-batch pipeline
(consumer/consumer.py poll loops, manual sync offset commits,
at-least-once + idempotent-id sinks — SURVEY.md §2.9). The Spark
equivalents here:

- ``stream_ingest_pages``: file-source stream over a web-pages
  directory -> extract/tokenize -> sink, with checkpointing standing
  in for Kafka's committed offsets (T2/T3). Uses availableNow so a
  batch run drains everything — testable without a broker; a Kafka
  source is a one-line swap of ``readStream.format``.
- ``stream_event_window_counts``: event-time tumbling window with
  watermark (the windowed-agg capability the reference lacks, T9).
- ``stream_live_index``: the reference's actual continuous flow —
  crawl batches land, the index grows (consumer/consumer.py's poll ->
  ES bulk loop). foreachBatch routes the first batch to build_index
  and every later batch through an anti-join against already-indexed
  urls (the reference's idempotent msgid set, collector.py:149-187)
  into update_index — so an at-least-once REPLAYED batch is a no-op
  and the index stays duplicate-free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from job_searchengine_project_spark.corpus import WEBPAGES_SCHEMA
from job_searchengine_project_spark.functions.extract import extract_text
from job_searchengine_project_spark.functions.tokenize import tokenize_morph


def stream_ingest_pages(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Stream web pages -> extracted+tokenized parquet, exactly-once
    via checkpoint + deterministic doc identity (sha256(url))."""
    pages = (
        spark.readStream.schema(WEBPAGES_SCHEMA)
        .parquet(pages_dir)
    )
    out = pages.select(
        F.sha2(F.col("url"), 256).alias("doc_uid"),
        "url",
        extract_text(F.col("html")).alias("text"),
        tokenize_morph(F.col("text")).alias("morph"),
        "lang",
    )
    return (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_live_index(
    spark: SparkSession,
    pages_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    **build_kw,
):
    """Streaming ingest that maintains a LIVE searchable index.

    First micro-batch -> ``build_index``; every later micro-batch
    anti-joins the already-indexed urls and appends only genuinely new
    docs via ``update_index`` (frozen-avgdl semantics). Checkpoint =
    committed offsets; the url anti-join makes replays idempotent."""
    from job_searchengine_project_spark.index.build import build_index
    from job_searchengine_project_spark.index.update import update_index

    pages = spark.readStream.schema(WEBPAGES_SCHEMA).parquet(pages_dir)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        ss = batch_df.sparkSession
        batch = batch_df.dropDuplicates(["url"])
        # the FIRST-batch test is the final stage's commit marker, not
        # stats.json: a crash between the docs and segments stages
        # leaves stats.json behind, and a replay must finish the build
        # (resume=True re-runs only the missing stage), not take the
        # update path and no-op behind the url anti-join.
        if not os.path.exists(os.path.join(index_dir, "_STAGE_OK_segments.json")):
            build_index(ss, batch, index_dir, resume=True, **build_kw)
            return
        # recover BEFORE the lazy `seen` read: a crashed prior update's
        # rollback deletes orphan forward files, and a file listing
        # captured earlier would make the anti-join scan deleted files
        from job_searchengine_project_spark.index.update import recover_index

        recover_index(index_dir)
        seen = ss.read.parquet(os.path.join(index_dir, "forward")).select("url")
        new = batch.join(seen, "url", "left_anti")
        update_index(ss, new, index_dir)

    return (
        pages.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_event_window_counts(
    spark: SparkSession,
    events_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Event-time tumbling-window counts with late-data watermark.

    Returns the started query (memory sink named 'event_windows');
    call ``q.processAllAvailable()`` then read the table.
    """
    static = spark.read.parquet(events_path)
    events = spark.readStream.schema(static.schema).parquet(events_path)
    # parquet ts is TIMESTAMP_NTZ; watermarks need an instant type
    # (session TZ is pinned UTC, so the cast is value-preserving)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("event_windows")
        .trigger(availableNow=True)
        .start()
    )


def stream_event_window_counts_sink(
    spark: SparkSession,
    events_path: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """The SHIPPABLE shape of the windowed agg: APPEND-mode to a
    parquet file sink. Each window row is written exactly once, when
    the watermark passes the window end — state for closed windows is
    evicted, so executor memory holds only open windows no matter how
    long the stream runs. (The memory-sink variant above keeps the
    whole result in driver memory via outputMode=complete; it exists
    as the oracle/smoke shape for ALL windows including still-open
    ones, and must not ship.) Windows newer than max(ts) - watermark
    are still open when an availableNow drain finishes and are NOT in
    the sink — they emit on the next run once later events close them."""
    static = spark.read.parquet(events_path)
    events = spark.readStream.schema(static.schema).parquet(events_path)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_first_seen_dedup(
    spark: SparkSession,
    src_dir: str,
    schema,
    key_col: str = "msgid",
    queryName: str = "first_seen",
):
    """Custom stateful operator: cross-batch first-seen dedup.

    The reference keeps a Redis SET of msgids so replayed/duplicate
    records are dropped across micro-batches (collector.py:149-187,
    T6 keyed state). Spark-native equivalent: per-key state in
    ``applyInPandasWithState`` — emit a key's row only the first time
    the key is ever seen; afterwards the state store suppresses it.
    State survives restarts via the checkpoint (not used in this
    memory-sink smoke shape).
    """
    import pandas as pd

    def first_seen(key, pdfs, state):
        if state.exists:
            return iter(())  # already emitted in an earlier batch
        first = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]]
        if first is None:
            return iter(())
        state.update((1,))
        return iter([first[[key_col]].assign(n_new=1)])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # one micro-batch per file
        .parquet(src_dir)
    )
    out = stream.groupBy(key_col).applyInPandasWithState(
        first_seen,
        outputStructType=f"{key_col} string, n_new int",
        stateStructType="seen int",
        outputMode="update",
        timeoutConf="NoTimeout",
    )
    return (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(queryName)
        .trigger(availableNow=True)
        .start()
    )


def event_window_counts_batch(spark, sf_dir: str) -> DataFrame:
    """Driver query: the streaming windowed agg, drained via
    availableNow and returned as a DataFrame (oracle: date_trunc SQL)."""
    import os
    import tempfile

    # the file stream source wants a directory; stage a symlink
    stage = os.path.join(
        tempfile.gettempdir(), "jse_stream_" + os.path.abspath(sf_dir).replace(os.sep, "_")
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(os.path.abspath(sf_dir), "events.parquet"), link)
    # windows are computed on instants; pin UTC so the NTZ->instant cast
    # and the rendered window_start agree with the (TZ-naive) oracle
    # even under a non-UTC caller session
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        q = stream_event_window_counts(spark, stage)
        q.awaitTermination()
        return spark.table("event_windows").orderBy("window_start", "event_type")
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


EVENT_WINDOW_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n, round(sum(value), 4) AS total_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
ORDER BY window_start, event_type
"""


def event_window_counts_closed(spark, sf_dir: str) -> DataFrame:
    """Driver query for the shippable append-mode sink: drain the
    events stream into a parquet sink (fresh checkpoint per call) and
    return what the sink holds — exactly the windows the final
    watermark (max ts - 2h) closed. The oracle filters the batch agg
    to the same closed-window set."""
    import os
    import shutil
    import tempfile

    stage = os.path.join(
        tempfile.gettempdir(), "jse_stream_" + os.path.abspath(sf_dir).replace(os.sep, "_")
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(os.path.abspath(sf_dir), "events.parquet"), link)
    run = tempfile.mkdtemp(prefix="jse_wsink_")
    out_dir, ck_dir = os.path.join(run, "sink"), os.path.join(run, "ck")
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        q = stream_event_window_counts_sink(spark, stage, out_dir, ck_dir)
        q.awaitTermination()
        rows = spark.read.parquet(out_dir).orderBy("window_start", "event_type")
        rows = rows.localCheckpoint()  # detach from the temp dir before cleanup
        return rows
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
        shutil.rmtree(run, ignore_errors=True)


EVENT_WINDOW_CLOSED_SQL = """
WITH wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM events)
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n, round(sum(value), 4) AS total_value
FROM events
WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= (SELECT w FROM wm)
GROUP BY date_trunc('hour', ts), event_type
ORDER BY window_start, event_type
"""

QUERIES = {
    "event_window_counts": (event_window_counts_batch, EVENT_WINDOW_SQL),
    "event_window_counts_closed": (event_window_counts_closed, EVENT_WINDOW_CLOSED_SQL),
}
