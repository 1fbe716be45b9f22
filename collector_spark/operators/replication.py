"""Replication scans (S25 primary, S26 standby lag).

Reference: input/postgres/replication.go:12-58.
  - Primary (S25): single-row projection with LSN-diff arithmetic
    (pg_wal_lsn_diff == BIGINT subtraction on byte positions) and the
    is_streaming COALESCE comparison.
  - Standbys (S26): per-standby sent/write/flush/replay positions,
    remote_byte_lag = sent - replay, local_byte_lag = current_wal - sent
    (NULL while in recovery), with the client_addr IS NOT NULL and
    wal_uploader filters from replicationStandbySQL.

Scale: the primary position is a one-row aggregate; Spark broadcasts it
into the standby projection (a 1-row broadcast-nested-loop join — no
shuffle of the standby side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def replication_primary(spark: SparkSession) -> DataFrame:
    """S25: primary replication state with apply lag arithmetic."""
    w = spark.table("wal_state")
    return w.select(
        F.col("in_recovery"),
        F.when(~F.col("in_recovery"), F.col("current_xlog_location")).alias(
            "current_xlog_location"
        ),
        (F.coalesce(F.col("receive_location"), F.lit(0)) >= F.col("replay_location")).alias(
            "is_streaming"
        ),
        F.col("receive_location"),
        F.col("replay_location"),
        (F.col("receive_location") - F.col("replay_location")).alias("apply_byte_lag"),
        F.col("replay_ts"),
    )


def oracle_replication_primary() -> str:
    return """
SELECT in_recovery,
  CASE WHEN NOT in_recovery THEN current_xlog_location END AS current_xlog_location,
  COALESCE(receive_location, 0) >= replay_location AS is_streaming,
  receive_location,
  replay_location,
  receive_location - replay_location AS apply_byte_lag,
  replay_ts
FROM wal_state
"""


def standby_lag(spark: SparkSession) -> DataFrame:
    """S26: per-standby byte lag against the primary's current position."""
    s = spark.table("standby_rows")
    cur = spark.table("wal_state").select("in_recovery", "current_xlog_location")
    out = (
        s.filter(
            F.col("client_addr").isNotNull()
            & ~(
                (F.col("client_addr") == "127.0.0.1")
                & (F.col("application_name") == "wal_uploader")
            )
        )
        .crossJoin(cur)  # 1-row side: broadcast nested loop, no shuffle
        .select(
            "client_addr",
            "role_oid",
            "pid",
            "application_name",
            "sync_priority",
            "sync_state",
            "state",
            "sent_lsn",
            "write_lsn",
            "flush_lsn",
            "replay_lsn",
            (F.col("sent_lsn") - F.col("replay_lsn")).alias("remote_byte_lag"),
            F.when(
                ~F.col("in_recovery"), F.col("current_xlog_location") - F.col("sent_lsn")
            ).alias("local_byte_lag"),
        )
        .orderBy("pid", "client_addr")
    )
    return out


def oracle_standby_lag() -> str:
    return """
SELECT client_addr, role_oid, pid, application_name, sync_priority, sync_state,
  state, sent_lsn, write_lsn, flush_lsn, replay_lsn,
  sent_lsn - replay_lsn AS remote_byte_lag,
  CASE WHEN NOT w.in_recovery THEN w.current_xlog_location - sent_lsn END AS local_byte_lag
FROM standby_rows s
CROSS JOIN (SELECT in_recovery, current_xlog_location FROM wal_state) w
WHERE client_addr IS NOT NULL
  AND NOT (client_addr = '127.0.0.1' AND application_name = 'wal_uploader')
ORDER BY pid, client_addr
"""
