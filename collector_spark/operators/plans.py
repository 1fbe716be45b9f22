"""Plan statistics operators (S30 scan, J6 plan-to-statement join).

Reference: input/postgres/plans.go:14-38,:47-145 — per-(statement key,
plan_id) plan text + counters, filtered to plan_type IN
('estimate','actual'); output/transform/postgres_plans.go joins plans back
to the statement dimension by (database, user, queryid).

Scale: plans share the statement key space — the join repartitions by the
3-column key once; the texts side is one row per key (same shape as J1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collector_spark.functions.fingerprint import fingerprint, oracle_fingerprint

PLAN_TYPES = ("estimate", "actual")


def plan_scan(spark: SparkSession) -> DataFrame:
    """S30: plan rows filtered to usable plan types."""
    return (
        spark.table("plan_rows")
        .filter(F.col("plan_type").isin(*PLAN_TYPES))
        .select(
            "database_oid",
            "user_oid",
            "query_id",
            "plan_id",
            "plan_type",
            "plan_text",
            "calls",
            F.col("total_time").cast("double").alias("total_time"),
        )
        .orderBy("database_oid", "user_oid", "query_id", "plan_id")
    )


def oracle_plan_scan() -> str:
    types = ", ".join(f"'{t}'" for t in PLAN_TYPES)
    return f"""
SELECT database_oid, user_oid, query_id, plan_id, plan_type, plan_text,
       calls, CAST(total_time AS DOUBLE) AS total_time
FROM plan_rows WHERE plan_type IN ({types})
ORDER BY database_oid, user_oid, query_id, plan_id
"""


def plan_statement_join(spark: SparkSession) -> DataFrame:
    """J6: attach the statement fingerprint to each plan row via the
    composite (database, user, query_id) key. stmt_texts is unique per key
    (toplevel is determined by query_id in the fixture), so the join cannot
    fan out."""
    plans = plan_scan(spark)
    texts = spark.table("stmt_texts").select(
        "database_oid",
        "user_oid",
        "query_id",
        fingerprint(F.col("query_text")).alias("fingerprint"),
    )
    return (
        plans.join(texts, on=["database_oid", "user_oid", "query_id"], how="left")
        .select(
            "database_oid",
            "user_oid",
            "query_id",
            "plan_id",
            F.coalesce(F.col("fingerprint"), F.lit(-1)).alias("fingerprint"),
            "plan_type",
            "calls",
        )
        .orderBy("database_oid", "user_oid", "query_id", "plan_id")
    )


def oracle_plan_statement_join() -> str:
    types = ", ".join(f"'{t}'" for t in PLAN_TYPES)
    fp = oracle_fingerprint("t.query_text")
    return f"""
WITH plans AS (
  SELECT database_oid, user_oid, query_id, plan_id, plan_type, calls
  FROM plan_rows WHERE plan_type IN ({types})
),
texts AS (
  SELECT database_oid, user_oid, query_id, {fp} AS fingerprint
  FROM stmt_texts t
)
SELECT p.database_oid, p.user_oid, p.query_id, p.plan_id,
       COALESCE(x.fingerprint, -1) AS fingerprint, p.plan_type, p.calls
FROM plans p
LEFT JOIN texts x USING (database_oid, user_oid, query_id)
ORDER BY p.database_oid, p.user_oid, p.query_id, p.plan_id
"""


# ---------------------------------------------------------------------------
# J11 — log-based EXPLAIN workflow (input/postgres/explain.go:18-99) as a
# relational routing program. The reference's control flow per sample:
# skip unmonitored DBs / collector queries / backup commands, pass
# auto_explain samples through untouched, refuse to EXPLAIN utility
# statements (the parse guard, :95-99), and otherwise run EXPLAIN against
# the live database. Here the live-PG stand-in is plan_rows keyed by
# (database_oid, query_id) — a missing plan row models the connection /
# permission failure path (runExplainForDb returns nil).
# ---------------------------------------------------------------------------

_EXPLAIN_UNMONITORED = (4,)  # fixture analog of the monitored-DB check
_COLLECTOR_MARKER = "/* pganalyze-collector */"


def explain_workflow(spark: SparkSession) -> DataFrame:
    """Route every sample exactly as RunExplain does, keeping skipped rows
    with an audit `route` (the reference's output = route IN
    ('auto_explain','explained')). One broadcast join against the bounded
    live-plan dimension; everything else is a map-side CASE."""
    from collector_spark.functions.utility import UTILITY_PREFIX

    s = spark.table("explain_samples")
    # MIN over the text itself: (database_oid, query_id) does not determine
    # plan_id/plan_text in the fixture, and min_by tie-breaking is
    # engine-dependent — a total order on the value is not
    live = F.broadcast(
        spark.table("plan_rows")
        .filter(F.col("plan_type") == "estimate")
        .groupBy("database_oid", "query_id")
        .agg(F.min("plan_text").alias("live_plan"))
    )
    joined = s.join(live, on=["database_oid", "query_id"], how="left")
    q = F.col("query_text")
    route = (
        F.when(
            F.col("database_oid").isin(*_EXPLAIN_UNMONITORED),
            F.lit("skipped_unmonitored"),
        )
        .when(q.startswith(_COLLECTOR_MARKER), F.lit("skipped_collector"))
        .when(
            q.contains("pg_start_backup") | q.contains("pg_stop_backup"),
            F.lit("skipped_backup"),
        )
        .when(F.col("has_explain"), F.lit("auto_explain"))
        .when(q.rlike(UTILITY_PREFIX), F.lit("skipped_utility"))
        .when(F.col("live_plan").isNotNull(), F.lit("explained"))
        .otherwise(F.lit("explain_error"))
    )
    return (
        joined.select(
            "sample_id",
            "database_oid",
            "query_id",
            route.alias("route"),
            F.when(route == "auto_explain", F.col("plan_json"))
            .when(route == "explained", F.col("live_plan"))
            .alias("plan"),
            F.when(
                route == "explain_error", F.lit("could not connect to database")
            ).alias("explain_error"),
            route.isin("auto_explain", "explained").alias("emitted"),
        )
        .orderBy("sample_id")
    )


def oracle_explain_workflow() -> str:
    from collector_spark.functions.utility import UTILITY_PREFIX

    dbs = ", ".join(str(d) for d in _EXPLAIN_UNMONITORED)
    return f"""
WITH live AS (
  SELECT database_oid, query_id, MIN(plan_text) AS live_plan
  FROM plan_rows WHERE plan_type = 'estimate'
  GROUP BY database_oid, query_id
),
routed AS (
  SELECT s.*, l.live_plan,
    CASE
      WHEN s.database_oid IN ({dbs}) THEN 'skipped_unmonitored'
      WHEN starts_with(s.query_text, '/* pganalyze-collector */') THEN 'skipped_collector'
      WHEN s.query_text LIKE '%pg_start_backup%' OR s.query_text LIKE '%pg_stop_backup%'
        THEN 'skipped_backup'
      WHEN s.has_explain THEN 'auto_explain'
      WHEN regexp_matches(s.query_text, '{UTILITY_PREFIX}') THEN 'skipped_utility'
      WHEN l.live_plan IS NOT NULL THEN 'explained'
      ELSE 'explain_error'
    END AS route
  FROM explain_samples s
  LEFT JOIN live l USING (database_oid, query_id)
)
SELECT sample_id, database_oid, query_id, route,
  CASE WHEN route = 'auto_explain' THEN plan_json
       WHEN route = 'explained' THEN live_plan END AS plan,
  CASE WHEN route = 'explain_error' THEN 'could not connect to database' END AS explain_error,
  route IN ('auto_explain', 'explained') AS emitted
FROM routed
ORDER BY sample_id
"""
