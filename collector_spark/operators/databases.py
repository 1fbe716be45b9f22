"""Database-level operators (F7a fixtures).

  S7 databases scan: pg_database LEFT JOIN pg_stat_database with the
     ``CASE WHEN datfrozenxid <> 0 THEN age(datfrozenxid) ELSE 0`` projection
     (input/postgres/databases.go:11-32, J4)
  A4 database stats diff (runner/diff.go:167-185): counters subtracted,
     age gauges pass through.

The databases dimension is tiny — Spark broadcasts it; the join never
shuffles the fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collector_spark.core.diff import diff_counters, oracle_diff_sql

KEYS = ["database_oid"]
COUNTERS = ["xact_commit", "xact_rollback", "temp_files", "temp_bytes"]
GAUGES = ["frozenxid_age", "minmxid_age"]


def databases_scan(spark: SparkSession) -> DataFrame:
    dims = spark.table("databases")
    stats = spark.table("db_stats_snap2")
    j = F.broadcast(dims).join(stats, on="database_oid", how="left")
    return j.select(
        "database_oid",
        "database_name",
        F.when(F.col("datfrozenxid") != 0, F.col("frozenxid_age"))
        .otherwise(F.lit(0))
        .alias("frozenxid_age"),
        F.coalesce(F.col("xact_commit"), F.lit(0)).alias("xact_commit"),
        F.coalesce(F.col("xact_rollback"), F.lit(0)).alias("xact_rollback"),
    ).orderBy("database_oid")


def oracle_databases_scan() -> str:
    return """
SELECT d.database_oid, d.database_name,
  CASE WHEN d.datfrozenxid <> 0 THEN s.frozenxid_age ELSE 0 END AS frozenxid_age,
  COALESCE(s.xact_commit, 0) AS xact_commit,
  COALESCE(s.xact_rollback, 0) AS xact_rollback
FROM databases d LEFT JOIN db_stats_snap2 s USING (database_oid)
ORDER BY d.database_oid
"""


def database_diff(spark: SparkSession) -> DataFrame:
    d = diff_counters(
        spark.table("db_stats_snap2"),
        spark.table("db_stats_snap1"),
        KEYS,
        COUNTERS,
        gauges=GAUGES,
    )
    return d.orderBy(*KEYS)


def oracle_database_diff() -> str:
    inner = oracle_diff_sql("db_stats_snap2", "db_stats_snap1", KEYS, COUNTERS, gauges=GAUGES)
    return f"SELECT * FROM ({inner}) d ORDER BY database_oid"
