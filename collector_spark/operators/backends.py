"""Activity-sampling operators over the backends fixture (F5).

  S5  backend projection w/ synthetic identity
      (input/postgres/backends.go:19-25: ``(extract(epoch from
      backend_start)::text || to_char(pid,'FM0000000'))::bigint``)
  S6/A10 backend counts: GROUP BY (datid, usesysid, state, backend_type,
      waiting) -> count(*)   (input/postgres/backend_counts.go:12-19)
  A14/S28 xmin-horizon: argmax age per source
      (input/postgres/server_stats.go:27-79)

All pure relational — map-side-combinable aggregations; no shuffle beyond
the groupBy itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

COUNT_KEYS = ["database_oid", "role_oid", "state", "backend_type", "waiting"]


def backend_counts(spark: SparkSession) -> DataFrame:
    return (
        spark.table("backends")
        .groupBy(*COUNT_KEYS)
        .agg(F.count("*").alias("backend_count"))
        .orderBy(*COUNT_KEYS)
    )


def oracle_backend_counts() -> str:
    keys = ", ".join(COUNT_KEYS)
    return (
        f"SELECT {keys}, CAST(COUNT(*) AS BIGINT) AS backend_count "
        f"FROM backends GROUP BY {keys} ORDER BY {keys}"
    )


def backend_identity(spark: SparkSession) -> DataFrame:
    """S5: stable synthetic identity from backend_start epoch + padded pid."""
    b = spark.table("backends")
    identity = F.concat(
        F.unix_timestamp("backend_start").cast("string"),
        F.lpad(F.col("pid").cast("string"), 7, "0"),
    ).cast("long")
    return (
        b.select(
            F.col("backend_id"),
            identity.alias("identity"),
            F.col("pid"),
            F.col("database_oid"),
            F.col("role_oid"),
            F.col("state"),
            F.col("application_name"),
        )
        .orderBy("backend_id")
    )


def oracle_backend_identity() -> str:
    return """
SELECT backend_id,
  CAST(CAST(CAST(floor(epoch(backend_start)) AS BIGINT) AS VARCHAR)
       || lpad(CAST(pid AS VARCHAR), 7, '0') AS BIGINT) AS identity,
  pid, database_oid, role_oid, state, application_name
FROM backends ORDER BY backend_id
"""


def xmin_horizon(spark: SparkSession) -> DataFrame:
    """A14: per backend_type, the backend holding back the xmin horizon.

    max_by tie behavior is engine-unspecified, and ``backend_xmin_age``
    repeats once events exceed its modulus — so the argmax orders by a
    zero-padded (age, backend_id) string key, a total order that both
    engines compare identically (highest backend_id wins ties).
    """
    order_key = F.concat(
        F.lpad(F.col("backend_xmin_age").cast("string"), 12, "0"),
        F.lpad(F.col("backend_id").cast("string"), 12, "0"),
    )
    return (
        spark.table("backends")
        .groupBy("backend_type")
        .agg(
            F.max("backend_xmin_age").alias("horizon_age"),
            F.max_by("backend_id", order_key).alias("holder_backend_id"),
        )
        .orderBy("backend_type")
    )


def oracle_xmin_horizon() -> str:
    return """
SELECT backend_type,
  CAST(MAX(backend_xmin_age) AS BIGINT) AS horizon_age,
  arg_max(backend_id,
          lpad(CAST(backend_xmin_age AS VARCHAR), 12, '0')
          || lpad(CAST(backend_id AS VARCHAR), 12, '0')) AS holder_backend_id
FROM backends GROUP BY backend_type ORDER BY backend_type
"""
