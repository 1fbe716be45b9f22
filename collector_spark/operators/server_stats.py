"""Server-level statistics operators.

  S8/A7 pg_stat_io diff per (backend_type, io_object, io_context)
        (input/postgres/server_stats.go:88-106, input/full_1min.go:111-131)
  P9    empty io-delta filter (input/full_1min.go:123-127)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collector_spark.core.diff import diff_counters, oracle_diff_sql

KEYS = ["backend_type", "io_object", "io_context"]
COUNTERS = ["reads", "writes", "extends", "hits", "evictions", "read_time", "write_time"]
DECIMALS = {"read_time", "write_time"}


def io_diff(spark: SparkSession) -> DataFrame:
    """A7 + P9: io counter deltas, dropping all-zero rows."""
    d = diff_counters(spark.table("io_snap2"), spark.table("io_snap1"), KEYS, COUNTERS)
    nonzero = None
    for c in COUNTERS:
        cond = F.col(c) != 0
        nonzero = cond if nonzero is None else (nonzero | cond)
    cols = [F.col(k) for k in KEYS] + [
        (F.col(c).cast("double") if c in DECIMALS else F.col(c)).alias(c) for c in COUNTERS
    ]
    return d.filter(nonzero).select(*cols).orderBy(*KEYS)


def oracle_io_diff() -> str:
    inner = oracle_diff_sql("io_snap2", "io_snap1", KEYS, COUNTERS)
    nonzero = " OR ".join(f"{c} <> 0" for c in COUNTERS)
    outer_cols = ", ".join(KEYS) + ", " + ", ".join(
        f"CAST({c} AS DOUBLE) AS {c}" if c in DECIMALS else c for c in COUNTERS
    )
    keys = ", ".join(KEYS)
    return (
        f"SELECT {outer_cols} FROM ({inner}) d WHERE {nonzero} ORDER BY {keys}"
    )
