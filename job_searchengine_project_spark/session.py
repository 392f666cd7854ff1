"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]`` (single JVM); the config below is
written for a multi-executor cluster and degrades gracefully to local
mode. AQE is on so skewed shuffles re-plan at runtime; shuffle
partition count defaults to the core count locally (the 200 default is
wrong at both ends of the scale).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "job_searchengine_project_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    On a real cluster, pass ``master=None`` with ``spark-submit`` supplying
    the master and leave ``shuffle_partitions`` to ~2-3x total cores.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] -> N; "local[*]" or cluster -> leave a sane default
        try:
            n = master.split("[", 1)[1].rstrip("]")
            shuffle_partitions = cpus if n == "*" else int(n)
        except (IndexError, ValueError):
            shuffle_partitions = 2 * cpus

    # Scan split size (scale-dependent, env-parameterised): the local
    # test tables are a handful of files well under the 128m default,
    # so a default split leaves a 32-core box scanning (and running all
    # per-row work) on 1-2 tasks. 16m locally lets a ~126 MB table fan
    # out to ~8 scan tasks; on a real cluster set 128m-1g via env
    # (guide: large sequential scans want big splits — there the input
    # has orders of magnitude more files than cores).
    max_part_bytes = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.files.maxPartitionBytes", max_part_bytes)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
