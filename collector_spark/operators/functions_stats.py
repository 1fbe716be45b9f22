"""Function statistics diff (S21/A8).

Reference: input/postgres/functions.go:41-49 scans pg_stat_user_functions
(calls, total_time, self_time) per function oid; state/postgres_function.go:
39-46 subtracts the previous snapshot per key. Reuses the shared diff kernel
(core.diff), so new-key and counter-reset semantics are identical to the
statement pipeline.

Scale: both snapshots arrive pre-keyed by (database_oid, function_oid) — a
single equi-join shuffle, map-side-combinable; function cardinality is tiny
next to statements, so this is never the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collector_spark.core.diff import diff_counters, oracle_diff_sql

KEYS = ["database_oid", "function_oid"]
COUNTERS = ["calls", "total_time", "self_time"]
DECIMALS = {"total_time", "self_time"}


def function_diff(spark: SparkSession) -> DataFrame:
    """A8: per-function counter deltas, decimals rendered as DOUBLE."""
    d = diff_counters(
        spark.table("func_snap2"),
        spark.table("func_snap1"),
        KEYS,
        COUNTERS,
        reset_col="calls",
    )
    cols = [F.col(k) for k in KEYS] + [
        (F.col(c).cast("double") if c in DECIMALS else F.col(c)).alias(c)
        for c in COUNTERS
    ]
    return d.select(*cols).orderBy(*KEYS)


def oracle_function_diff() -> str:
    inner = oracle_diff_sql(
        "func_snap2",
        "func_snap1",
        KEYS,
        COUNTERS,
        reset_col="calls",
        double_cols=DECIMALS,
    )
    keys = ", ".join(KEYS)
    return f"SELECT * FROM ({inner}) d ORDER BY {keys}"
