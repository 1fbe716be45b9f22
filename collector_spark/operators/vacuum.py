"""Vacuum progress scan (S27).

Reference: input/postgres/vacuum_progress.go:27-66 — pg_stat_progress_vacuum
JOIN pg_stat_activity USING (pid), LEFT JOIN pg_class for authoritative
names with a regex fallback extracted from the autovacuum query text,
composite (epoch || zero-padded pid) identities, the ignore-schema blanking
of relname, and the insufficient-privilege row filter.

Scale: both sides are per-pid singletons (hundreds of rows/server); the
joins broadcast. The regex evaluates on the activity side only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# dialect-neutral: no backslash escapes ([.] matches the literal dot), so the
# identical pattern text compiles the same in Java regex and RE2
VAC_PATTERN = "autovacuum: VACUUM (ANALYZE )?([^.]+)[.]([^ ]+)"

# ignore-schema regexp ($1 in vacuumProgressSQLDefault; !~* is
# case-insensitive, hence the inline (?i))
IGNORE_REGEXP = "(?i)^public[.]rel_1[0-9]*$"


def _identity(ts_col: str) -> Column:
    return F.concat(
        F.unix_timestamp(ts_col).cast("string"),
        F.lpad(F.col("pid").cast("string"), 7, "0"),
    ).cast("long")


def vacuum_progress(spark: SparkSession) -> DataFrame:
    act = spark.table("vacuum_activity").select(
        "pid",
        "query_start",
        "backend_start",
        "datname",
        "usename",
        "query",
        F.nullif(F.regexp_extract("query", VAC_PATTERN, 2), F.lit("")).alias("a_nspname"),
        F.nullif(F.regexp_extract("query", VAC_PATTERN, 3), F.lit("")).alias("a_relname"),
    )
    prog = spark.table("vacuum_progress")
    meta = spark.table("relation_meta").select(
        F.col("relation_oid").alias("relid"), "schema_name", "table_name"
    )
    j = prog.join(act, on="pid", how="inner").join(F.broadcast(meta), on="relid", how="left")

    nspname = F.coalesce(F.col("schema_name"), F.col("a_nspname"))
    relname = F.coalesce(F.col("table_name"), F.col("a_relname"))
    qualified = F.concat_ws(".", nspname, relname)
    return (
        j.filter(
            F.col("schema_name").isNotNull()
            | (
                (F.col("query") != "<insufficient privilege>")
                & F.col("a_nspname").isNotNull()
                & F.col("a_relname").isNotNull()
            )
        )
        .select(
            _identity("query_start").alias("vacuum_identity"),
            _identity("backend_start").alias("backend_identity"),
            F.col("datname"),
            nspname.alias("nspname"),
            F.when(qualified.rlike(IGNORE_REGEXP), F.lit("")).otherwise(relname).alias(
                "relname"
            ),
            F.col("usename"),
            F.col("query_start").alias("started_at"),
            F.col("query").startswith("autovacuum: VACUUM").alias("autovacuum"),
            F.col("phase"),
            F.col("heap_blks_total"),
            F.col("heap_blks_scanned"),
            F.col("heap_blks_vacuumed"),
            F.col("index_vacuum_count"),
        )
        .orderBy("vacuum_identity")
    )


def oracle_vacuum_progress() -> str:
    ident = (
        "CAST(CAST(CAST(floor(epoch({ts})) AS BIGINT) AS VARCHAR)"
        " || lpad(CAST(a.pid AS VARCHAR), 7, '0') AS BIGINT)"
    )
    return f"""
WITH act AS (
  SELECT pid, query_start, backend_start, datname, usename, query,
    NULLIF(regexp_extract(query, 'autovacuum: VACUUM (ANALYZE )?([^.]+)[.]([^ ]+)', 2), '') AS a_nspname,
    NULLIF(regexp_extract(query, 'autovacuum: VACUUM (ANALYZE )?([^.]+)[.]([^ ]+)', 3), '') AS a_relname
  FROM vacuum_activity
)
SELECT
  {ident.format(ts='a.query_start')} AS vacuum_identity,
  {ident.format(ts='a.backend_start')} AS backend_identity,
  a.datname,
  COALESCE(m.schema_name, a.a_nspname) AS nspname,
  CASE WHEN regexp_matches(
         COALESCE(m.schema_name, a.a_nspname) || '.' || COALESCE(m.table_name, a.a_relname),
         '(?i)^public[.]rel_1[0-9]*$')
       THEN '' ELSE COALESCE(m.table_name, a.a_relname) END AS relname,
  a.usename,
  a.query_start AS started_at,
  a.query LIKE 'autovacuum: VACUUM%' AS autovacuum,
  p.phase, p.heap_blks_total, p.heap_blks_scanned, p.heap_blks_vacuumed,
  p.index_vacuum_count
FROM vacuum_progress p
JOIN act a USING (pid)
LEFT JOIN relation_meta m ON m.relation_oid = p.relid
WHERE m.schema_name IS NOT NULL
   OR (a.query <> '<insufficient privilege>' AND a.a_nspname IS NOT NULL AND a.a_relname IS NOT NULL)
ORDER BY vacuum_identity
"""
