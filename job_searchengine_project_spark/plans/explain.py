"""Physical-plan inspection helpers.

`.explain()` hygiene, testable: the build and query plans must show
the physical properties the 100 TB design depends on — parquet filter
pushdown, column pruning, broadcast joins for small dims, and
whole-stage codegen around JVM-side expressions. Tests assert these
so a regression that silently de-optimizes a plan fails CI, not a
cluster bill.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    s = plan_str(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", s)


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names in each scan's ReadSchema (column-pruning check)."""
    s = plan_str(df)
    out = []
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", s):
        out.append([c.split(":")[0].strip() for c in m.split(",") if c.strip()])
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_str(df)


def codegen_stage_count(df: DataFrame) -> int:
    return plan_str(df).count("WholeStageCodegen")
