"""Vacuum progress scan (S27) + compact-activity vacuum facts (F28).

Reference, scan side: input/postgres/vacuum_progress.go:27-66 —
pg_stat_progress_vacuum JOIN pg_stat_activity USING (pid), LEFT JOIN
pg_class for authoritative names with a regex fallback extracted from the
autovacuum query text, composite (epoch || zero-padded pid) identities, the
ignore-schema blanking of relname, COALESCE(usename, '') (line 35), and the
insufficient-privilege row filter. After the scan, rows whose resolved
schema is pg_toast are re-resolved to their parent table
(vacuum_progress.go:119-131 + helpers.go:28-45): pg_toast_<oid> → the
relation owning that toast table, toast=true; an unresolvable toast name
keeps the pg_toast name with toast=false (the PrintVerbose error path).
Resolution happens AFTER the ignore-regexp blanking, exactly like the
reference — a resolved parent name is NOT re-blanked.

Reference, transform side: output/transform/activity.go:48-108 — each
vacuum becomes a VacuumProgressInformation (dense role/database/relation
refs, -1 sentinels for empty role/relation names) and, when a phase is
present, a VacuumProgressStatistic with the 7-value phase enum
(compact_activity_snapshot.pb.go:1023-1029). `snapshot_vacuum_fact` emits
both as one row per vacuum since the identity join key is shared.

Scale: both sides are per-pid singletons (hundreds of rows/server); every
join broadcasts (relation_meta for names, the three dense dims). The regex
evaluates on the activity side only. Dense dims use core.dims.dense_index —
no single-partition window at any dim cardinality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from collector_spark.core.dims import dense_index

# dialect-neutral: no backslash escapes ([.] matches the literal dot), so the
# identical pattern text compiles the same in Java regex and RE2
VAC_PATTERN = "autovacuum: VACUUM (ANALYZE )?([^.]+)[.]([^ ]+)"

# ignore-schema regexp ($1 in vacuumProgressSQLDefault; !~* is
# case-insensitive, hence the inline (?i))
IGNORE_REGEXP = "(?i)^public[.]rel_1[0-9]*$"

# pg_toast relation name shape accepted by resolveToastTable's pg_class
# subquery (helpers.go:28-36); the oid digits are the lookup key
TOAST_PATTERN = "^pg_toast_([0-9]+)$"

# transform/activity.go:88-103 — phase string → VacuumProgressStatistic enum
PHASES = [
    ("initializing", 0),
    ("scanning heap", 1),
    ("vacuuming indexes", 2),
    ("vacuuming heap", 3),
    ("cleaning up indexes", 4),
    ("truncating heap", 5),
    ("performing final cleanup", 6),
]


def _identity(ts_col: str) -> Column:
    return F.concat(
        F.unix_timestamp(ts_col).cast("string"),
        F.lpad(F.col("pid").cast("string"), 7, "0"),
    ).cast("long")


def _vacuum_rows(spark: SparkSession) -> DataFrame:
    """S27 rows with TOAST parent resolution applied — the shared relation
    behind the scan-shaped output and the F28 facts."""
    act = spark.table("vacuum_activity").select(
        "pid",
        "query_start",
        "backend_start",
        "datname",
        # COALESCE(a.usename, '') — vacuumProgressSQLDefault line 35
        F.coalesce(F.col("usename"), F.lit("")).alias("usename"),
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
    base = j.filter(
        F.col("schema_name").isNotNull()
        | (
            (F.col("query") != "<insufficient privilege>")
            & F.col("a_nspname").isNotNull()
            & F.col("a_relname").isNotNull()
        )
    ).select(
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
    # post-scan TOAST resolution (vacuum_progress.go:119-131): join the oid
    # parsed out of pg_toast_<oid> back to relation_meta; a hit rewrites the
    # names to the parent table and sets toast, a miss keeps the pg_toast
    # name (the logged-error path). relation_meta broadcasts.
    toast_oid = F.regexp_extract("relname", TOAST_PATTERN, 1)
    parents = spark.table("relation_meta").select(
        F.col("relation_oid").alias("t_oid"),
        F.col("schema_name").alias("t_schema"),
        F.col("table_name").alias("t_table"),
    )
    return (
        base.withColumn(
            "t_key",
            F.when(
                (F.col("nspname") == "pg_toast") & (toast_oid != ""),
                toast_oid.cast("long"),
            ),
        )
        .join(F.broadcast(parents), F.col("t_key") == F.col("t_oid"), "left")
        .select(
            "vacuum_identity",
            "backend_identity",
            "datname",
            F.coalesce("t_schema", "nspname").alias("nspname"),
            F.coalesce("t_table", "relname").alias("relname"),
            "usename",
            "started_at",
            "autovacuum",
            F.col("t_schema").isNotNull().alias("toast"),
            "phase",
            "heap_blks_total",
            "heap_blks_scanned",
            "heap_blks_vacuumed",
            "index_vacuum_count",
        )
    )


def vacuum_progress(spark: SparkSession) -> DataFrame:
    return _vacuum_rows(spark).orderBy("vacuum_identity")


_SQL_ROWS = """
WITH act AS (
  SELECT pid, query_start, backend_start, datname,
    COALESCE(usename, '') AS usename, query,
    NULLIF(regexp_extract(query, 'autovacuum: VACUUM (ANALYZE )?([^.]+)[.]([^ ]+)', 2), '') AS a_nspname,
    NULLIF(regexp_extract(query, 'autovacuum: VACUUM (ANALYZE )?([^.]+)[.]([^ ]+)', 3), '') AS a_relname
  FROM vacuum_activity
),
base AS (
  SELECT
    CAST(CAST(CAST(floor(epoch(a.query_start)) AS BIGINT) AS VARCHAR)
         || lpad(CAST(a.pid AS VARCHAR), 7, '0') AS BIGINT) AS vacuum_identity,
    CAST(CAST(CAST(floor(epoch(a.backend_start)) AS BIGINT) AS VARCHAR)
         || lpad(CAST(a.pid AS VARCHAR), 7, '0') AS BIGINT) AS backend_identity,
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
),
resolved AS (
  SELECT
    b.vacuum_identity, b.backend_identity, b.datname,
    COALESCE(t.schema_name, b.nspname) AS nspname,
    COALESCE(t.table_name, b.relname) AS relname,
    b.usename, b.started_at, b.autovacuum,
    t.schema_name IS NOT NULL AS toast,
    b.phase, b.heap_blks_total, b.heap_blks_scanned, b.heap_blks_vacuumed,
    b.index_vacuum_count
  FROM base b
  LEFT JOIN relation_meta t
    ON b.nspname = 'pg_toast'
   AND regexp_extract(b.relname, '^pg_toast_([0-9]+)$', 1) <> ''
   AND t.relation_oid = TRY_CAST(regexp_extract(b.relname, '^pg_toast_([0-9]+)$', 1) AS BIGINT)
)
"""


def oracle_vacuum_progress() -> str:
    return _SQL_ROWS + "SELECT * FROM resolved ORDER BY vacuum_identity"


# ---------------------------------------------------------------------------
# F28 — CompactActivitySnapshot vacuum facts (transform/activity.go:48-108)
# ---------------------------------------------------------------------------


def snapshot_vacuum_fact(spark: SparkSession) -> DataFrame:
    """One row per in-progress vacuum: the VacuumProgressInformation dense
    refs + the VacuumProgressStatistic phase enum and counters, keyed by
    vacuum_identity. Empty role name → role_idx -1
    (transform/activity.go:56-60); empty relation name (the ignore-regexp
    blank) → relation_idx -1 (:63-67); database ref always upserted (:62).
    The relation ref key is (database_idx, schema, relation) exactly like
    upsertRelationReference."""
    rows = _vacuum_rows(spark)
    db_dim = dense_index(rows, ["datname"], "database_idx")
    role_dim = dense_index(rows.filter(F.col("usename") != ""), ["usename"], "role_idx")
    with_db = rows.join(F.broadcast(db_dim), "datname")
    rel_dim = dense_index(
        with_db.filter(F.col("relname") != ""),
        ["database_idx", "nspname", "relname"],
        "relation_idx",
    )
    phase_code = F.lit(None).cast("int")
    for name, code in reversed(PHASES):
        phase_code = F.when(F.col("phase") == name, F.lit(code)).otherwise(phase_code)
    return (
        with_db.join(F.broadcast(role_dim), "usename", "left")
        .join(F.broadcast(rel_dim), ["database_idx", "nspname", "relname"], "left")
        .select(
            "vacuum_identity",
            "backend_identity",
            "autovacuum",
            "toast",
            F.coalesce(F.col("role_idx"), F.lit(-1)).cast("int").alias("role_idx"),
            F.col("database_idx").cast("int").alias("database_idx"),
            F.coalesce(F.col("relation_idx"), F.lit(-1)).cast("int").alias("relation_idx"),
            "started_at",
            phase_code.alias("phase_code"),
            "heap_blks_total",
            "heap_blks_scanned",
            "heap_blks_vacuumed",
            "index_vacuum_count",
        )
        .orderBy("vacuum_identity")
    )


def oracle_snapshot_vacuum_fact() -> str:
    phase_case = "CASE r.phase " + " ".join(
        f"WHEN '{name}' THEN {code}" for name, code in PHASES
    ) + " END"
    return _SQL_ROWS + f""",
dbs AS (
  SELECT datname, CAST(row_number() OVER (ORDER BY datname) - 1 AS INT) AS database_idx
  FROM (SELECT DISTINCT datname FROM resolved)
),
roles AS (
  SELECT usename, CAST(row_number() OVER (ORDER BY usename) - 1 AS INT) AS role_idx
  FROM (SELECT DISTINCT usename FROM resolved WHERE usename <> '')
),
rels AS (
  SELECT database_idx, nspname, relname,
         CAST(row_number() OVER (ORDER BY database_idx, nspname, relname) - 1 AS INT) AS relation_idx
  FROM (
    SELECT DISTINCT d.database_idx, r.nspname, r.relname
    FROM resolved r JOIN dbs d USING (datname)
    WHERE r.relname <> ''
  )
)
SELECT
  r.vacuum_identity,
  r.backend_identity,
  r.autovacuum,
  r.toast,
  CAST(COALESCE(ro.role_idx, -1) AS INT) AS role_idx,
  d.database_idx,
  CAST(COALESCE(re.relation_idx, -1) AS INT) AS relation_idx,
  r.started_at,
  CAST({phase_case} AS INT) AS phase_code,
  r.heap_blks_total, r.heap_blks_scanned, r.heap_blks_vacuumed,
  r.index_vacuum_count
FROM resolved r
JOIN dbs d USING (datname)
LEFT JOIN roles ro USING (usename)
LEFT JOIN rels re
  ON re.database_idx = d.database_idx
 AND re.nspname = r.nspname AND re.relname = r.relname
ORDER BY vacuum_identity
"""
