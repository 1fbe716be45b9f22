"""Snapshot assembly: star-schema emit + integrity check + partitioned sink
(SURVEY §7.2 step 6).

Reference: output/transform/transform.go builds the FullSnapshot protobuf —
dimension arrays (roles, databases, queries) with dense int32 idx, fact
arrays referencing them — and output/full.go:26-33 verifies integrity
(every fact idx within dimension bounds) before emitting. The sink here is
partitioned parquet instead of protobuf-over-websocket: same star schema,
cluster-native format.

Scale: dimensions are per-server small (J10 note); facts join to them via
broadcast. The sink partitions by database_oid — the reference's natural
tenant key — so downstream reads prune partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collector_spark.core.dims import dense_index
from collector_spark.core.pinned import pinned
from collector_spark.operators.statements import (
    oracle_statement_rollup,
    statement_rollup,
)


def _dense_dim(df: DataFrame, key_cols: list[str], idx_name: str) -> DataFrame:
    """J10 dense-idx builder: sorted distinct keys -> 0-based int32 idx,
    assigned by the scalable two-level rank (core/dims.py) — no
    single-partition window even for the fingerprint dim."""
    return dense_index(df, key_cols, idx_name)


# The rollup feeds three dimension builds plus the fact join (~7 lineage
# evaluations of the full statement pipeline otherwise); it is tiny (one
# row per fingerprint group), so pin it via the shared input-keyed cache
# (core/pinned.py).
def _persisted_rollup(spark: SparkSession) -> DataFrame:
    return pinned(spark, "statement_rollup", lambda: statement_rollup(spark))


def assemble_statement_fact(spark: SparkSession) -> DataFrame:
    """The star-schema statement fact: rollup rows with dense dimension
    idx for database, role, and query."""
    rollup = _persisted_rollup(spark)
    db_dim = _dense_dim(rollup, ["database_oid"], "database_idx")
    role_dim = _dense_dim(rollup, ["user_oid"], "role_idx")
    query_dim = _dense_dim(rollup, ["fingerprint"], "query_idx")
    return (
        rollup.join(F.broadcast(db_dim), on="database_oid")
        .join(F.broadcast(role_dim), on="user_oid")
        .join(F.broadcast(query_dim), on="fingerprint")
        .select(
            "query_idx",
            "database_idx",
            "role_idx",
            "database_oid",
            "user_oid",
            "fingerprint",
            "toplevel",
            "calls",
            F.col("total_time").cast("double").alias("total_time"),
            "rows",
        )
        .orderBy("query_idx", "database_idx", "role_idx", "toplevel")
    )


def oracle_statement_fact() -> str:
    rollup = oracle_statement_rollup()
    return f"""
WITH rollup AS ({rollup}),
db_dim AS (
  SELECT database_oid,
    CAST(row_number() OVER (ORDER BY database_oid) - 1 AS INT) AS database_idx
  FROM (SELECT DISTINCT database_oid FROM rollup)
),
role_dim AS (
  SELECT user_oid,
    CAST(row_number() OVER (ORDER BY user_oid) - 1 AS INT) AS role_idx
  FROM (SELECT DISTINCT user_oid FROM rollup)
),
query_dim AS (
  SELECT fingerprint,
    CAST(row_number() OVER (ORDER BY fingerprint) - 1 AS INT) AS query_idx
  FROM (SELECT DISTINCT fingerprint FROM rollup)
)
SELECT q.query_idx, d.database_idx, r.role_idx,
       f.database_oid, f.user_oid, f.fingerprint, f.toplevel,
       f.calls, CAST(f.total_time AS DOUBLE) AS total_time, f.rows
FROM rollup f
JOIN db_dim d USING (database_oid)
JOIN role_dim r USING (user_oid)
JOIN query_dim q USING (fingerprint)
ORDER BY q.query_idx, d.database_idx, r.role_idx, f.toplevel
"""


def verify_integrity(fact: DataFrame) -> None:
    """output/full.go:26-33 analog: every fact idx must be present and
    non-negative, and idx spaces must be dense (max idx + 1 == distinct
    count). Raises on violation."""
    checks = fact.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(
                F.col("query_idx").isNull()
                | F.col("database_idx").isNull()
                | F.col("role_idx").isNull()
                | (F.col("query_idx") < 0)
                | (F.col("database_idx") < 0)
                | (F.col("role_idx") < 0),
                1,
            ).otherwise(0)
        ).alias("bad_idx"),
        (F.max("query_idx") + 1 - F.count_distinct("query_idx")).alias("q_gap"),
        (F.max("database_idx") + 1 - F.count_distinct("database_idx")).alias("d_gap"),
        (F.max("role_idx") + 1 - F.count_distinct("role_idx")).alias("r_gap"),
    ).collect()[0]
    if checks["n"] == 0:
        raise ValueError("snapshot integrity: empty fact")
    if checks["bad_idx"]:
        raise ValueError(f"snapshot integrity: {checks['bad_idx']} rows with bad idx")
    for gap in ("q_gap", "d_gap", "r_gap"):
        if checks[gap] != 0:
            raise ValueError(f"snapshot integrity: non-dense idx space ({gap})")


def write_snapshot(spark: SparkSession, path: str) -> None:
    """Integrity-checked partitioned parquet sink."""
    fact = assemble_statement_fact(spark)
    verify_integrity(fact)
    fact.write.mode("overwrite").partitionBy("database_oid").parquet(path)
