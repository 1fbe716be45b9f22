"""Server-level statistics operators.

  S8/A7 pg_stat_io diff per (backend_type, io_object, io_context)
        (input/postgres/server_stats.go:88-106, input/full_1min.go:111-131)
  P9    empty io-delta filter (input/full_1min.go:123-127)
  S3    pg_stat_statements_info scan (server_stats.go:81-86)
  S29   transaction-id scan (server_stats.go:13-25)
  S33/A9 collector self-stats diff (state/collector_stats.go,
        runner/diff.go:152-155)
  S28   xmin-horizon: five max-age sources assembled into one row
        (server_stats.go:27-79 — each source an ORDER BY age DESC LIMIT 1)
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


def statements_info(spark: SparkSession) -> DataFrame:
    """S3: dealloc count + last stats reset (single-row scan)."""
    return spark.table("stmts_info").select("dealloc", "stats_reset")


def oracle_statements_info() -> str:
    return "SELECT dealloc, stats_reset FROM stmts_info"


def txid_scan(spark: SparkSession) -> DataFrame:
    """S29: current transaction id + next multixact (single-row scan)."""
    return spark.table("txid_state").select("current_xact_id", "next_multixact_id")


def oracle_txid_scan() -> str:
    return "SELECT current_xact_id, next_multixact_id FROM txid_state"


_COLL_KEYS = ["server_id"]
_COLL_COUNTERS = ["cgo_calls"]
_COLL_GAUGES = ["heap_bytes", "rss_bytes", "goroutines"]


def collector_diff(spark: SparkSession) -> DataFrame:
    """S33/A9: cgo-call delta, memory/goroutine gauges pass through."""
    return diff_counters(
        spark.table("coll_snap2"),
        spark.table("coll_snap1"),
        _COLL_KEYS,
        _COLL_COUNTERS,
        gauges=_COLL_GAUGES,
    ).orderBy("server_id")


def oracle_collector_diff() -> str:
    inner = oracle_diff_sql(
        "coll_snap2", "coll_snap1", _COLL_KEYS, _COLL_COUNTERS, gauges=_COLL_GAUGES
    )
    return f"SELECT * FROM ({inner}) d ORDER BY server_id"


def xmin_horizon_full(spark: SparkSession) -> DataFrame:
    """S28: one row with the max holdback age of each of the five sources
    (backends, replication-slot xmin, replication-slot catalog xmin,
    prepared xacts, standby feedback), each COALESCEd to 0 like the
    reference's '0'::xid fallbacks.

    Five tiny single-row aggregates crossJoined — every join side is one
    row, so the assembly is broadcast-only (no shuffle beyond the partial
    aggregations themselves).
    """
    backends = spark.table("backends").agg(
        F.coalesce(F.max("backend_xmin_age"), F.lit(0)).cast("long").alias("backend_age")
    )
    slots = spark.table("repl_slots").agg(
        F.coalesce(F.max("xmin_age"), F.lit(0)).cast("long").alias("slot_xmin_age"),
        F.coalesce(F.max("catalog_xmin_age"), F.lit(0))
        .cast("long")
        .alias("slot_catalog_xmin_age"),
    )
    prepared = spark.table("prepared_xacts").agg(
        F.coalesce(F.max("xact_age"), F.lit(0)).cast("long").alias("prepared_xact_age")
    )
    standby = spark.table("standby_rows").agg(
        F.coalesce(F.max("feedback_xmin_age"), F.lit(0)).cast("long").alias("standby_age")
    )
    return backends.crossJoin(slots).crossJoin(prepared).crossJoin(standby)


def oracle_xmin_horizon_full() -> str:
    return """
SELECT
  CAST(COALESCE((SELECT MAX(backend_xmin_age) FROM backends), 0) AS BIGINT) AS backend_age,
  CAST(COALESCE((SELECT MAX(xmin_age) FROM repl_slots), 0) AS BIGINT) AS slot_xmin_age,
  CAST(COALESCE((SELECT MAX(catalog_xmin_age) FROM repl_slots), 0) AS BIGINT) AS slot_catalog_xmin_age,
  CAST(COALESCE((SELECT MAX(xact_age) FROM prepared_xacts), 0) AS BIGINT) AS prepared_xact_age,
  CAST(COALESCE((SELECT MAX(feedback_xmin_age) FROM standby_rows), 0) AS BIGINT) AS standby_age
"""


def server_version_scan(spark: SparkSession) -> DataFrame:
    """S35: the server version/capability fingerprint
    (input/postgres/version.go:12-59, state.PostgresVersion): short
    version parsed from pg_catalog.version()'s full string, major from
    server_version_num integer math, EPAS from the full-string marker,
    Aurora from the rds.extensions setting containing aurora_stat_utils,
    AlloyDB from any alloydb.* setting, Citus from exactly one citus
    extension row. Map-only projection over the per-server probe table."""
    p = spark.table("version_probe_rows")
    return p.select(
        "server_id",
        "version_full",
        F.regexp_extract("version_full", r"(\d+\.\d+)", 1).alias("version_short"),
        "version_num",
        F.floor(F.col("version_num") / 10000).cast("long").alias("major_version"),
        F.col("version_full")
        .contains("EnterpriseDB Advanced Server")
        .alias("is_epas"),
        F.coalesce(
            F.col("rds_extensions_setting").contains("aurora_stat_utils"),
            F.lit(False),
        ).alias("is_aws_aurora"),
        (F.col("alloydb_setting_count") >= 1).alias("is_alloydb"),
        (F.col("citus_ext_count") == 1).alias("is_citus"),
    ).orderBy("server_id")


def oracle_server_version_scan() -> str:
    return r"""
SELECT server_id, version_full,
  regexp_extract(version_full, '(\d+\.\d+)', 1) AS version_short,
  version_num,
  CAST(FLOOR(version_num / 10000) AS BIGINT) AS major_version,
  contains(version_full, 'EnterpriseDB Advanced Server') AS is_epas,
  COALESCE(contains(rds_extensions_setting, 'aurora_stat_utils'), FALSE) AS is_aws_aurora,
  alloydb_setting_count >= 1 AS is_alloydb,
  citus_ext_count = 1 AS is_citus
FROM version_probe_rows
ORDER BY server_id
"""
