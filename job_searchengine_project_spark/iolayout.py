"""Input-layout helpers: spread under-split scans across the cluster.

A parquet scan parallelizes at row-group granularity: a table written
as one file with one row group yields ONE non-empty scan task no
matter how many cores the session has, so any per-row-heavy
computation layered on the scan (regex families, shingle hashing,
hyperplane projections, token explodes) runs serially while the rest
of the cluster idles — the "input skew" case of the optimization
playbook (one unsplittable input unit; repartition immediately after
the read).

``read_spread`` counts the path's splittable units driver-side (local
parquet footers — microseconds) and round-robin repartitions to the
session's default parallelism ONLY when the scan cannot reach it on
its own. At real scale the input has orders of magnitude more row
groups than the cluster has cores and the helper is a no-op — the
repartition never becomes a hidden full-corpus shuffle.

Only output-order-insensitive pipelines should use it (everything in
this repo pins final ordering explicitly).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession


def scan_units(path: str) -> int:
    """Number of splittable scan units (row groups) under a local
    parquet file or directory. Returns a large number on any metadata
    hiccup so callers fail open (no repartition)."""
    import pyarrow.parquet as pq

    try:
        files = (
            glob.glob(os.path.join(path, "*.parquet"))
            if os.path.isdir(path)
            else [path]
        )
        return sum(pq.read_metadata(f).num_row_groups for f in files) or 1
    except Exception:
        return 1 << 30


def read_spread(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet(path)``, round-robin repartitioned to the
    session's default parallelism when the file layout cannot feed
    that many scan tasks. The shuffle moves only the (small) under-
    split table once; the per-row work downstream then uses every
    core instead of one."""
    df = spark.read.parquet(path)
    par = spark.sparkContext.defaultParallelism
    if scan_units(path) >= par:
        return df
    return df.repartition(par)


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Tiny driver-local result set as a LocalRelation.

    ``spark.createDataFrame(list, ddl)`` builds an RDD-backed plan
    whose every ``collect()`` pays a full one-task Spark job (~0.3 s
    of scheduling on this box) — the dominant cost of every
    driver-engine query's result materialization. Routing the same
    rows through a pandas frame with an EXPLICIT schema plans a
    ``LocalTableScan`` (Arrow conversion), whose collect is job-free.
    Values are identical (same schema coercion; exact ints/doubles
    pass through Arrow untouched). Falls back to the classic path for
    anything pandas/Arrow cannot represent."""
    import pandas as pd
    from pyspark.sql.types import _parse_datatype_string

    st = _parse_datatype_string(schema) if isinstance(schema, str) else schema
    try:
        pdf = pd.DataFrame(
            [tuple(r) for r in rows], columns=[f.name for f in st.fields]
        )
        return spark.createDataFrame(pdf, schema=st)
    except Exception:
        return spark.createDataFrame(rows, st)
