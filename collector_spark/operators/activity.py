"""Activity compact-snapshot assembly (the 10 s pipeline's star-schema
emit).

Reference: output/transform/activity.go:9-46 builds CompactActivitySnapshot
— per-backend rows carrying RoleIdx / DatabaseIdx / QueryIdx into upserted
reference arrays (upsertRoleReference / upsertDatabaseReference /
upsertQueryReferenceAndInformationSimple in output/transform/util.go), with
Has*Idx flags when the underlying value is NULL-able and -1 the
missing-reference convention (activity.go:60,68). The reference upserts in
insertion order; this engine's dimension contract is global sorted rank
(core/dims.py), deterministic and order-insensitive.

The query reference is keyed (role_idx, database_idx, fingerprint) exactly
like QueryReference in the proto; vacuum progress ships separately via S27.

The backends fixture models invalidity the way pg_stat_activity does:
autovacuum workers carry no role, only client backends carry a query text;
the fixture's opaque ``q-N`` token renders as a SQL text so fingerprints
are distinct per query family.

Scale: three dense_index builds (no single-partition windows) + broadcast
joins back onto the fact — dims are orders of magnitude smaller than the
backend fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collector_spark.core.dims import dense_index
from collector_spark.core.pinned import pinned
from collector_spark.functions.fingerprint import fingerprint, oracle_fingerprint


def _role_name() -> F.Column:
    return F.when(
        F.col("backend_type") != "autovacuum worker",
        F.concat(F.lit("role_"), F.col("role_oid").cast("string")),
    )


def _db_name() -> F.Column:
    return F.concat(F.lit("db_"), F.col("database_oid").cast("string"))


def _query_text() -> F.Column:
    return F.when(
        F.col("backend_type") == "client backend",
        F.concat(F.lit("SELECT * FROM tbl_"), F.substring(F.col("query"), 3, 10)),
    )


def activity_snapshot(spark: SparkSession) -> DataFrame:
    # The per-backend fact feeds three dimension builds plus the final
    # join — pin its projection once so the backends derivation (a lazy
    # fixture view) evaluates a single time instead of once per branch.
    # Bounded: per-connection rows, O(max_connections) per server, never
    # O(data).
    fact = pinned(
        spark,
        "activity_fact",
        lambda: spark.table("backends").select(
            "backend_id",
            "pid",
            "state",
            "backend_type",
            _role_name().alias("role_name"),
            _db_name().alias("database_name"),
            F.col("query").alias("query_raw"),
            _query_text().alias("query_text"),
        ),
    )
    # dim builds read column-pruned projections; the fingerprint chain runs
    # ONLY over the distinct query texts (a few hundred rows), broadcast as
    # a text->fp map to both the query dim build and the fact join — the
    # fact side never evaluates a hash. Dim partition counts stay small:
    # dimension key sets are parallelism-sized, not data-sized.
    role_dim = dense_index(
        fact.select("role_name").filter(F.col("role_name").isNotNull()),
        ["role_name"],
        "role_idx",
        num_parts=8,
    )
    db_dim = dense_index(
        fact.select("database_name"),
        ["database_name"],
        "database_idx",
        num_parts=8,
    )
    fp_map = (
        fact.filter(F.col("query_text").isNotNull())
        .select("query_raw", "query_text")
        .distinct()
        .select(
            "query_raw",
            fingerprint(F.col("query_text")).alias("fp"),
        )
    )
    qkeys = (
        fact.filter(F.col("query_text").isNotNull())
        .select("role_name", "database_name", "query_raw")
        .distinct()
        .join(F.broadcast(fp_map), on="query_raw")
        .join(F.broadcast(role_dim), on="role_name", how="left")
        .join(F.broadcast(db_dim), on="database_name")
        .withColumn("q_role_idx", F.coalesce(F.col("role_idx"), F.lit(-1)))
    )
    query_dim = dense_index(
        qkeys, ["q_role_idx", "database_idx", "fp"], "query_idx", num_parts=16
    )
    return (
        fact.join(F.broadcast(role_dim), on="role_name", how="left")
        .join(F.broadcast(db_dim), on="database_name")
        .join(F.broadcast(fp_map), on="query_raw", how="left")
        .withColumn("q_role_idx", F.coalesce(F.col("role_idx"), F.lit(-1)))
        .join(
            F.broadcast(query_dim),
            on=["q_role_idx", "database_idx", "fp"],
            how="left",
        )
        .select(
            "backend_id",
            "pid",
            "state",
            "backend_type",
            F.coalesce(F.col("role_idx"), F.lit(-1)).alias("role_idx"),
            F.col("role_idx").isNotNull().alias("has_role_idx"),
            "database_idx",
            F.when(
                F.col("query_text").isNotNull(),
                F.coalesce(F.col("query_idx"), F.lit(-1)),
            ).otherwise(F.lit(-1)).alias("query_idx"),
            (
                F.col("query_text").isNotNull() & F.col("query_idx").isNotNull()
            ).alias("has_query_idx"),
            "query_text",
        )
        .orderBy("backend_id")
    )


def oracle_activity_snapshot() -> str:
    fp = oracle_fingerprint("query_text")
    return f"""
WITH src AS (
  SELECT backend_id, pid, state, backend_type,
    CASE WHEN backend_type <> 'autovacuum worker'
         THEN 'role_' || CAST(role_oid AS VARCHAR) END AS role_name,
    'db_' || CAST(database_oid AS VARCHAR) AS database_name,
    CASE WHEN backend_type = 'client backend'
         THEN 'SELECT * FROM tbl_' || substr(query, 3, 10) END AS query_text
  FROM backends
),
src2 AS (
  SELECT *, CASE WHEN query_text IS NOT NULL THEN {fp} END AS fp FROM src
),
role_dim AS (
  SELECT role_name,
    CAST(row_number() OVER (ORDER BY role_name) - 1 AS INT) AS role_idx
  FROM (SELECT DISTINCT role_name FROM src WHERE role_name IS NOT NULL)
),
db_dim AS (
  SELECT database_name,
    CAST(row_number() OVER (ORDER BY database_name) - 1 AS INT) AS database_idx
  FROM (SELECT DISTINCT database_name FROM src)
),
wd AS (
  SELECT s.*, r.role_idx, d.database_idx
  FROM src2 s
  LEFT JOIN role_dim r USING (role_name)
  JOIN db_dim d USING (database_name)
),
query_dim AS (
  SELECT q_role_idx, database_idx, fp,
    CAST(row_number() OVER (ORDER BY q_role_idx, database_idx, fp) - 1 AS INT) AS query_idx
  FROM (
    SELECT DISTINCT COALESCE(role_idx, -1) AS q_role_idx, database_idx, fp
    FROM wd WHERE query_text IS NOT NULL
  )
)
SELECT wd.backend_id, wd.pid, wd.state, wd.backend_type,
  COALESCE(wd.role_idx, -1) AS role_idx,
  wd.role_idx IS NOT NULL AS has_role_idx,
  wd.database_idx,
  COALESCE(q.query_idx, -1) AS query_idx,
  q.query_idx IS NOT NULL AS has_query_idx,
  wd.query_text
FROM wd
LEFT JOIN query_dim q
  ON q.q_role_idx = COALESCE(wd.role_idx, -1)
  AND q.database_idx = wd.database_idx
  AND q.fp = wd.fp
ORDER BY wd.backend_id
"""
