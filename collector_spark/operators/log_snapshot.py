"""Compact LOG snapshot assembly — the third of the reference's compact
snapshot types, next to statements (operators/snapshot.py) and activity
(operators/activity.py).

Reference: output/transform/logs.go:13-19 — LogStateToLogSnapshot emits
QuerySamples wired to upserted role/database/query reference arrays
(transformPostgresQuerySamples, logs.go:21-98: empty username/database fall
back to the server-config defaults, then role_idx/database_idx/query_idx
are upserted per sample). The LogLineInformations half of the snapshot is
the already-green classified-lines path (u7d_details_json).

Spark-native: the sample base pins once (core/pinned.py), the three
dimensions use the scalable two-level rank (core/dims.py), and every join
back onto the sample fact broadcasts a dimension — the same star-assembly
shape as the statement fact, so the 100 TB reasoning carries over: dims
are O(distinct members), facts never shuffle for the idx wiring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collector_spark.core.dims import dense_index
from collector_spark.core.pinned import pinned
from collector_spark.functions.fingerprint import (
    fingerprint,
    normalize_query,
    oracle_fingerprint,
    oracle_normalize,
)
from collector_spark.logs.querysample import _AE_SCHEMA, AUTO_EXPLAIN_RE

# server-config fallbacks (logs.go:29-35 GetEffectiveDbUsername/GetDbName)
DEFAULT_USERNAME = "collector_user"
DEFAULT_DATABASE = "collector_db"


def _sample_base(spark: SparkSession) -> DataFrame:
    from collector_spark.logs.stitch import stitch_lines

    lines = stitch_lines(spark).filter(F.col("content").rlike(AUTO_EXPLAIN_RE))
    plan_json = F.regexp_extract("content", AUTO_EXPLAIN_RE, 2)
    return lines.select(
        "pid",
        "seq",
        F.coalesce(F.nullif(F.col("username"), F.lit("")), F.lit(DEFAULT_USERNAME)).alias(
            "username"
        ),
        F.coalesce(F.nullif(F.col("database"), F.lit("")), F.lit(DEFAULT_DATABASE)).alias(
            "database_name"
        ),
        F.regexp_extract("content", AUTO_EXPLAIN_RE, 1)
        .cast("double")
        .alias("runtime_ms"),
        normalize_query(F.from_json(plan_json, _AE_SCHEMA)["Query Text"]).alias(
            "query_norm"
        ),
    )


def assemble_log_snapshot(spark: SparkSession) -> DataFrame:
    """QuerySamples with dense role/database/query reference indexes."""
    base = pinned(spark, "log_sample_base", lambda: _sample_base(spark))
    role_dim = dense_index(base.select("username"), ["username"], "role_idx", 8)
    db_dim = dense_index(
        base.select("database_name"), ["database_name"], "database_idx", 8
    )
    fp_map = (
        base.select("query_norm")
        .distinct()
        .select("query_norm", fingerprint(F.col("query_norm")).alias("fp"))
    )
    qkeys = (
        base.select("username", "database_name", "query_norm")
        .distinct()
        .join(F.broadcast(fp_map), "query_norm")
        .join(F.broadcast(role_dim), "username")
        .join(F.broadcast(db_dim), "database_name")
    )
    query_dim = dense_index(
        qkeys, ["role_idx", "database_idx", "fp"], "query_idx", 16
    )
    return (
        base.join(F.broadcast(role_dim), "username")
        .join(F.broadcast(db_dim), "database_name")
        .join(F.broadcast(fp_map), "query_norm")
        .join(F.broadcast(query_dim), ["role_idx", "database_idx", "fp"])
        .select(
            "pid",
            "seq",
            "role_idx",
            "database_idx",
            "query_idx",
            "runtime_ms",
            "query_norm",
        )
        .orderBy("pid", "seq")
    )


def oracle_log_snapshot(stitched_cte: str) -> str:
    rx = AUTO_EXPLAIN_RE.replace("'", "''")
    qt = oracle_normalize(
        "json_extract_string(regexp_extract(content, '"
        + rx
        + "', 2), '$.\"Query Text\"')"
    )
    fp = oracle_fingerprint("query_norm")
    return f"""
WITH stitched AS ({stitched_cte}),
base AS (
  SELECT pid, seq,
    COALESCE(NULLIF(username, ''), '{DEFAULT_USERNAME}') AS username,
    COALESCE(NULLIF(database, ''), '{DEFAULT_DATABASE}') AS database_name,
    CAST(regexp_extract(content, '{rx}', 1) AS DOUBLE) AS runtime_ms,
    {qt} AS query_norm
  FROM stitched
  WHERE regexp_matches(content, '{rx}')
),
withfp AS (SELECT *, {fp} AS fp FROM base),
role_dim AS (
  SELECT username,
    CAST(row_number() OVER (ORDER BY username) - 1 AS INT) AS role_idx
  FROM (SELECT DISTINCT username FROM base)
),
db_dim AS (
  SELECT database_name,
    CAST(row_number() OVER (ORDER BY database_name) - 1 AS INT) AS database_idx
  FROM (SELECT DISTINCT database_name FROM base)
),
keyed AS (
  SELECT w.*, r.role_idx, d.database_idx
  FROM withfp w JOIN role_dim r USING (username) JOIN db_dim d USING (database_name)
),
query_dim AS (
  SELECT role_idx, database_idx, fp,
    CAST(row_number() OVER (ORDER BY role_idx, database_idx, fp) - 1 AS INT) AS query_idx
  FROM (SELECT DISTINCT role_idx, database_idx, fp FROM keyed)
)
SELECT k.pid, k.seq, k.role_idx, k.database_idx, q.query_idx,
       k.runtime_ms, k.query_norm
FROM keyed k JOIN query_dim q USING (role_idx, database_idx, fp)
ORDER BY k.pid, k.seq
"""
