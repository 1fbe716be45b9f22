"""Schema catalog scans (S13-S22, S24) and the dense-idx dimension upsert
(J10).

Reference:
  S13 relations + inheritance children array  input/postgres/relations.go:20-50,:192-280
  S14 columns                                 relations.go:52-86
  S15 indices (defs + table join)             relations.go:88-133
  S16 constraints (conkey/confkey)            relations.go:135-170
  S17 view definitions                        relations.go:172-190
  S18 column statistics                       relation_column_stats.go:13-70
  S19 extended statistics                     relation_stats_ext.go:13-60
  S20 functions (kind CASE, config)           functions.go:18-39,:57-120
  S21 function statistics scan                functions.go:41-49
  S22 roles + member_of aggregation           roles.go:13-30
  S24 extensions                              extensions.go:10-16
  J10 dimension upserts -> dense int32 idx    output/transform/util.go:25-150

Array-valued outputs (children, member_of) are emitted as sorted
comma-joined strings so the oracle hash compares them deterministically.

Scale: every scan is a projection/broadcast-join over catalog-sized tables
(<= 5000 relations/server in the reference); the only aggregations
(children, member_of) are map-side-combinable collect_lists. J10's dense
idx uses a row_number over a sorted dimension — the dimension is small by
construction (it feeds a protobuf snapshot), so the single-partition window
is bounded; at scale, dimensions stay per-server, never global.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession

from collector_spark.core.dims import dense_index
from pyspark.sql import functions as F


def _sorted_join(col: str) -> Column:
    return F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.col(col))), lambda x: x.cast("string")
        ),
        ",",
    )


def relations_schema(spark: SparkSession) -> DataFrame:
    """S13: relation metadata + partition strategy + children list."""
    cls = spark.table("class_rows")
    children = (
        cls.filter(F.col("parent_oid").isNotNull())
        .select(F.col("parent_oid").alias("p_oid"), F.col("oid").alias("child_oid"))
        .groupBy("p_oid")
        .agg(_sorted_join("child_oid").alias("child_relids"))
        .withColumnRenamed("p_oid", "oid")
    )
    return (
        cls.filter(F.col("relkind").isin("r", "v", "m", "p"))
        .join(children, on="oid", how="left")
        .select(
            "oid",
            "nspname",
            "relname",
            "relkind",
            F.when(
                F.col("relkind") == "p",
                F.when(F.col("oid") % 2 == 0, F.lit("range")).otherwise(F.lit("list")),
            ).alias("partition_strategy"),
            F.col("parent_oid"),
            F.coalesce(F.col("child_relids"), F.lit("")).alias("child_relids"),
        )
        .orderBy("oid")
    )


def oracle_relations_schema() -> str:
    return """
WITH children AS (
  SELECT parent_oid AS oid,
    array_to_string(list_sort(list(CAST(oid AS VARCHAR))), ',') AS child_relids
  FROM class_rows WHERE parent_oid IS NOT NULL GROUP BY parent_oid
)
SELECT c.oid, c.nspname, c.relname, c.relkind,
  CASE WHEN c.relkind = 'p'
       THEN CASE WHEN c.oid % 2 = 0 THEN 'range' ELSE 'list' END END AS partition_strategy,
  c.parent_oid,
  COALESCE(ch.child_relids, '') AS child_relids
FROM class_rows c
LEFT JOIN children ch ON ch.oid = c.oid
WHERE c.relkind IN ('r','v','m','p')
ORDER BY c.oid
"""


def columns_scan(spark: SparkSession) -> DataFrame:
    """S14: per-column metadata joined to its relation."""
    cols = spark.table("column_rows")
    cls = spark.table("class_rows").select("oid", "nspname", "relname")
    return (
        cols.join(
            F.broadcast(cls), cols["relation_oid"] == cls["oid"], "inner"
        )
        .select(
            "relation_oid",
            "nspname",
            "relname",
            "column_name",
            "position",
            "data_type",
            "not_null",
            "default_expr",
        )
        .orderBy("relation_oid", "position")
    )


def oracle_columns_scan() -> str:
    return """
SELECT c.relation_oid, k.nspname, k.relname, c.column_name, c.position,
       c.data_type, c.not_null, c.default_expr
FROM column_rows c JOIN class_rows k ON c.relation_oid = k.oid
ORDER BY c.relation_oid, c.position
"""


def indices_scan(spark: SparkSession) -> DataFrame:
    """S15: index defs joined to their table names."""
    idx = spark.table("index_rows")
    cls = spark.table("class_rows").select("oid", "nspname", "relname")
    return (
        idx.join(F.broadcast(cls), idx["indrelid"] == cls["oid"], "inner")
        .select(
            "index_oid",
            "indrelid",
            "nspname",
            F.col("relname").alias("table_name"),
            "index_name",
            "index_size_bytes",
        )
        .orderBy("index_oid")
    )


def oracle_indices_scan() -> str:
    return """
SELECT i.index_oid, i.indrelid, k.nspname, k.relname AS table_name,
       i.index_name, i.index_size_bytes
FROM index_rows i JOIN class_rows k ON i.indrelid = k.oid
ORDER BY i.index_oid
"""


def constraints_scan(spark: SparkSession) -> DataFrame:
    """S16: constraint defs with FK target passthrough."""
    con = spark.table("constraint_rows")
    cls = spark.table("class_rows").select("oid", "relname")
    return (
        con.join(F.broadcast(cls), con["relation_oid"] == cls["oid"], "inner")
        .select(
            "relation_oid",
            "relname",
            "conname",
            "contype",
            "conkey_1",
            "confrelid",
        )
        .orderBy("relation_oid", "conname")
    )


def oracle_constraints_scan() -> str:
    return """
SELECT c.relation_oid, k.relname, c.conname, c.contype, c.conkey_1, c.confrelid
FROM constraint_rows c JOIN class_rows k ON c.relation_oid = k.oid
ORDER BY c.relation_oid, c.conname
"""


def view_definitions(spark: SparkSession) -> DataFrame:
    """S17: synthesized pg_get_viewdef per view/matview."""
    cls = spark.table("class_rows")
    return (
        cls.filter(F.col("relkind").isin("v", "m"))
        .select(
            "oid",
            "nspname",
            "relname",
            F.concat(
                F.lit("SELECT * FROM rel_"), (F.col("oid") % 100).cast("string")
            ).alias("view_definition"),
        )
        .orderBy("oid")
    )


def oracle_view_definitions() -> str:
    return """
SELECT oid, nspname, relname,
  'SELECT * FROM rel_' || CAST(oid % 100 AS VARCHAR) AS view_definition
FROM class_rows WHERE relkind IN ('v','m')
ORDER BY oid
"""


def column_stats(spark: SparkSession) -> DataFrame:
    """S18: pg_stats projection for unfiltered relations."""
    return (
        spark.table("colstat_rows")
        .select(
            "relation_oid",
            "column_name",
            "null_frac",
            "avg_width",
            "n_distinct",
            "correlation",
        )
        .orderBy("relation_oid", "column_name")
    )


def oracle_column_stats() -> str:
    return """
SELECT relation_oid, column_name, null_frac, avg_width, n_distinct, correlation
FROM colstat_rows ORDER BY relation_oid, column_name
"""


def extended_stats(spark: SparkSession) -> DataFrame:
    """S19: pg_statistic_ext projection."""
    return (
        spark.table("extstat_rows")
        .select("relation_oid", "stat_name", "stat_kind", "n_distinct")
        .orderBy("relation_oid", "stat_name")
    )


def oracle_extended_stats() -> str:
    return """
SELECT relation_oid, stat_name, stat_kind, n_distinct
FROM extstat_rows ORDER BY relation_oid, stat_name
"""


def functions_scan(spark: SparkSession) -> DataFrame:
    """S20: pg_proc projection with the kind CASE (functions.go:57-120)."""
    return (
        spark.table("func_meta")
        .select(
            "function_oid",
            "database_oid",
            "schema_name",
            "function_name",
            "language",
            F.when(F.col("kind") == "f", F.lit("function"))
            .when(F.col("kind") == "p", F.lit("procedure"))
            .when(F.col("kind") == "a", F.lit("aggregate"))
            .otherwise(F.lit("window"))
            .alias("kind_label"),
            "security_definer",
            "leakproof",
            "strict",
            "returns_set",
            "volatile",
        )
        .orderBy("function_oid")
    )


def oracle_functions_scan() -> str:
    return """
SELECT function_oid, database_oid, schema_name, function_name, language,
  CASE kind WHEN 'f' THEN 'function' WHEN 'p' THEN 'procedure'
            WHEN 'a' THEN 'aggregate' ELSE 'window' END AS kind_label,
  security_definer, leakproof, strict, returns_set, volatile
FROM func_meta ORDER BY function_oid
"""


def function_stats_scan(spark: SparkSession) -> DataFrame:
    """S21: the raw pg_stat_user_functions scan (A8 diffs it)."""
    return (
        spark.table("func_snap2")
        .select(
            "database_oid",
            "function_oid",
            "calls",
            F.col("total_time").cast("double").alias("total_time"),
            F.col("self_time").cast("double").alias("self_time"),
        )
        .orderBy("database_oid", "function_oid")
    )


def oracle_function_stats_scan() -> str:
    return """
SELECT database_oid, function_oid, calls,
  CAST(total_time AS DOUBLE) AS total_time,
  CAST(self_time AS DOUBLE) AS self_time
FROM func_snap2 ORDER BY database_oid, function_oid
"""


def roles_scan(spark: SparkSession) -> DataFrame:
    """S22: roles with aggregated member_of list."""
    roles = spark.table("role_rows")
    members = (
        spark.table("role_members")
        .groupBy("role_oid")
        .agg(_sorted_join("member_of_oid").alias("member_of"))
    )
    return (
        roles.join(members, on="role_oid", how="left")
        .select(
            "role_oid",
            "rolname",
            "superuser",
            "can_login",
            "create_db",
            "conn_limit",
            F.coalesce(F.col("member_of"), F.lit("")).alias("member_of"),
        )
        .orderBy("role_oid")
    )


def oracle_roles_scan() -> str:
    return """
WITH m AS (
  SELECT role_oid,
    array_to_string(list_sort(list(CAST(member_of_oid AS VARCHAR))), ',') AS member_of
  FROM role_members GROUP BY role_oid
)
SELECT r.role_oid, r.rolname, r.superuser, r.can_login, r.create_db,
       r.conn_limit, COALESCE(m.member_of, '') AS member_of
FROM role_rows r LEFT JOIN m USING (role_oid)
ORDER BY r.role_oid
"""


def extensions_scan(spark: SparkSession) -> DataFrame:
    """S24: pg_extension join pg_namespace."""
    return (
        spark.table("extension_rows")
        .select("extension_oid", "extname", "nspname", "extversion")
        .orderBy("extension_oid")
    )


def oracle_extensions_scan() -> str:
    return """
SELECT extension_oid, extname, nspname, extversion
FROM extension_rows ORDER BY extension_oid
"""


def extension_versions(spark: SparkSession) -> DataFrame:
    """S4: installed vs available extension minor versions via split_part
    (input/postgres/statements.go:50-58)."""
    e = spark.table("extension_rows")
    minor = F.split_part(F.col("extversion"), F.lit("."), F.lit(2)).cast("int")
    available = F.when(F.col("extension_oid") % 2 == 0, minor + 1).otherwise(minor)
    return e.select(
        "extension_oid",
        "extname",
        "nspname",
        F.split_part(F.col("extversion"), F.lit("."), F.lit(1)).cast("int").alias(
            "installed_major"
        ),
        minor.alias("installed_minor"),
        available.alias("available_minor"),
        (available > minor).alias("upgrade_available"),
    ).orderBy("extension_oid")


def oracle_extension_versions() -> str:
    return """
SELECT extension_oid, extname, nspname,
  CAST(split_part(extversion, '.', 1) AS INT) AS installed_major,
  CAST(split_part(extversion, '.', 2) AS INT) AS installed_minor,
  CASE WHEN extension_oid % 2 = 0 THEN CAST(split_part(extversion, '.', 2) AS INT) + 1
       ELSE CAST(split_part(extversion, '.', 2) AS INT) END AS available_minor,
  (CASE WHEN extension_oid % 2 = 0 THEN CAST(split_part(extversion, '.', 2) AS INT) + 1
        ELSE CAST(split_part(extversion, '.', 2) AS INT) END)
    > CAST(split_part(extversion, '.', 2) AS INT) AS upgrade_available
FROM extension_rows ORDER BY extension_oid
"""


def citus_size_override(spark: SparkSession) -> DataFrame:
    """S12: Citus aux sizes replace the local size stats for distributed
    tables (input/postgres/relation_stats_aux.go:11-60) — a conditional
    left join + withColumn overwrite."""
    cls = spark.table("class_rows").select("oid", "relname", "table_size_bytes")
    aux = spark.table("citus_aux").select(
        F.col("relation_oid").alias("oid"), "citus_logical_size"
    )
    j = cls.join(F.broadcast(aux), on="oid", how="left")
    return j.select(
        "oid",
        "relname",
        F.coalesce(F.col("citus_logical_size"), F.col("table_size_bytes")).alias(
            "effective_size_bytes"
        ),
        F.col("citus_logical_size").isNotNull().alias("is_distributed"),
    ).orderBy("oid")


def oracle_citus_size_override() -> str:
    return """
SELECT c.oid, c.relname,
  COALESCE(a.citus_logical_size, c.table_size_bytes) AS effective_size_bytes,
  a.citus_logical_size IS NOT NULL AS is_distributed
FROM class_rows c
LEFT JOIN citus_aux a ON a.relation_oid = c.oid
ORDER BY c.oid
"""


def dimension_upsert(spark: SparkSession) -> DataFrame:
    """J10: dedup-or-append dimension build producing dense int32 idx, then
    facts rejoined on the surrogate key (output/transform/util.go:25-150).

    The reference assigns idx in insertion order; a distributed engine uses
    canonical (sorted) order instead — deterministic and order-insensitive
    (SURVEY.md §7.4 hard part 5). Dims here: databases and roles observed in
    the backends activity fact.
    """
    b = spark.table("backends")
    db_dim = dense_index(b, ["database_oid"], "database_idx")
    role_dim = dense_index(b, ["role_oid"], "role_idx")
    return (
        b.groupBy("database_oid", "role_oid")
        .agg(F.count("*").alias("backend_count"))
        .join(F.broadcast(db_dim), on="database_oid")
        .join(F.broadcast(role_dim), on="role_oid")
        .select(
            "database_idx", "role_idx", "database_oid", "role_oid", "backend_count"
        )
        .orderBy("database_idx", "role_idx")
    )


def oracle_dimension_upsert() -> str:
    return """
WITH db_dim AS (
  SELECT database_oid,
    CAST(row_number() OVER (ORDER BY database_oid) - 1 AS INT) AS database_idx
  FROM (SELECT DISTINCT database_oid FROM backends)
),
role_dim AS (
  SELECT role_oid,
    CAST(row_number() OVER (ORDER BY role_oid) - 1 AS INT) AS role_idx
  FROM (SELECT DISTINCT role_oid FROM backends)
),
fact AS (
  SELECT database_oid, role_oid, CAST(COUNT(*) AS BIGINT) AS backend_count
  FROM backends GROUP BY database_oid, role_oid
)
SELECT d.database_idx, r.role_idx, f.database_oid, f.role_oid, f.backend_count
FROM fact f
JOIN db_dim d USING (database_oid)
JOIN role_dim r USING (role_oid)
ORDER BY d.database_idx, r.role_idx
"""


# ---------------------------------------------------------------------------
# J14 — schema-collection workflow (input/postgres/schema.go:49-118
# CollectAllSchemas): the per-database loop as relational routing.
#
#   * a database name already collected is skipped without consuming any
#     attempt time (the `collected` map, :58-64) -> route 'duplicate';
#   * attempts run in collect order under one 8-minute deadline
#     (schemaCollectionTimeout, :19); the attempt that crosses it fails on
#     the schema context AND stops all further collection — already-
#     collected databases are still sent (:77-82) -> route
#     'timeout_skipped' for the crossing attempt and everything after it
#     (the cumulative-seconds running sum is monotone, so the route is a
#     suffix by construction);
#   * a connect/collection error before the deadline skips only that
#     database (:83-91) -> route 'error_skipped';
#   * everything else is 'collected' (DatabaseOidsWithLocalCatalog append,
#     :94);
#   * after the loop, a collected relation total above the table limit
#     (defaultSchemaTableLimit = 5000, :14, :96-110) suppresses schema
#     output server-wide: every row carries schema_suppressed = true but
#     the routes stand (the reference keeps the data and only skips the
#     send).
#
# Error attempts still consume their attempt time (the reference's failed
# collectOneSchema runs inside the same deadline).
#
# Scale: the running sum orders ALL attempts of one server in one window
# partition — bounded by databases-per-server (config-capped), never
# data-scaled; the total is a 1-row broadcast.
# ---------------------------------------------------------------------------

SCHEMA_TIMEOUT_SECS = 480
SCHEMA_TABLE_LIMIT = 5000


def schema_collection_workflow(spark: SparkSession) -> DataFrame:
    from pyspark.sql import Window

    dbs = spark.table("schema_collect_dbs")
    rn = F.row_number().over(
        Window.partitionBy("db_name").orderBy("collect_order")
    )
    dedup = dbs.withColumn("rn", rn)
    attempts = dedup.filter(F.col("rn") == 1).withColumn(
        "cum_secs",
        F.sum("collect_secs").over(
            Window.orderBy("collect_order").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    route = (
        F.when(F.col("cum_secs") > SCHEMA_TIMEOUT_SECS, F.lit("timeout_skipped"))
        .when(F.col("connect_error"), F.lit("error_skipped"))
        .otherwise(F.lit("collected"))
    )
    routed = attempts.withColumn("route", route)
    total = routed.agg(
        F.sum(
            F.when(F.col("route") == "collected", F.col("n_relations"))
        ).cast("long").alias("total_rels")
    )
    dups = dedup.filter(F.col("rn") > 1).select(
        "database_oid",
        "db_name",
        "collect_order",
        F.lit("duplicate").alias("route"),
        F.lit(None).cast("long").alias("cum_secs"),
        F.lit(None).cast("long").alias("n_relations"),
    )
    main = routed.select(
        "database_oid",
        "db_name",
        "collect_order",
        "route",
        "cum_secs",
        F.when(F.col("route") == "collected", F.col("n_relations")).alias(
            "n_relations"
        ),
    )
    return (
        main.unionByName(dups)
        .crossJoin(F.broadcast(total))
        .select(
            "database_oid",
            "db_name",
            "collect_order",
            "route",
            "cum_secs",
            "n_relations",
            (F.col("total_rels") > SCHEMA_TABLE_LIMIT).alias("schema_suppressed"),
        )
        .orderBy("collect_order")
    )


def oracle_schema_collection_workflow() -> str:
    return f"""
WITH dedup AS (
  SELECT *, row_number() OVER (
      PARTITION BY db_name ORDER BY collect_order) AS rn
  FROM schema_collect_dbs
),
attempts AS (
  SELECT *, CAST(SUM(collect_secs) OVER (
      ORDER BY collect_order
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS cum_secs
  FROM dedup WHERE rn = 1
),
routed AS (
  SELECT *,
    CASE WHEN cum_secs > {SCHEMA_TIMEOUT_SECS} THEN 'timeout_skipped'
         WHEN connect_error THEN 'error_skipped'
         ELSE 'collected' END AS route
  FROM attempts
),
total AS (
  SELECT CAST(SUM(CASE WHEN route = 'collected' THEN n_relations END)
              AS BIGINT) AS total_rels
  FROM routed
),
unioned AS (
  SELECT database_oid, db_name, collect_order, route, cum_secs,
    CASE WHEN route = 'collected' THEN n_relations END AS n_relations
  FROM routed
  UNION ALL
  SELECT database_oid, db_name, collect_order, 'duplicate',
    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
  FROM dedup WHERE rn > 1
)
SELECT u.database_oid, u.db_name, u.collect_order, u.route, u.cum_secs,
  u.n_relations, t.total_rels > {SCHEMA_TABLE_LIMIT} AS schema_suppressed
FROM unioned u CROSS JOIN total t
ORDER BY u.collect_order
"""
