"""On-demand query run state machine (J12).

Reference: runner/query_run.go:40-117 — every cycle picks up QueryRuns with
no FinishedAt, stamps StartedAt, and routes: non-EXPLAIN types fail
immediately ("Unhandled query run type"), then a database connection is
established (failure -> error result), then the pganalyze.explain_analyze
helper is required ("Required helper function ... is not set up"), then the
backend pid is recorded, the no-alert marker comment is prepended, and
EXPLAIN runs. cleanup (:119-132) drops finished runs older than 10 minutes.

The live-PG stand-in is the same plan_rows estimate dimension the J11
explain workflow uses: a missing plan row models the connection failure
path. "now" for the cleanup TTL is the newest request timestamp — the batch
analog of time.Since (same single-row-aggregate pattern as A13's TTL).

Scale: one broadcast join against the bounded live-plan dim plus one 1-row
broadcast of the clock; the routing itself is a map-side CASE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# query_run.go:125 — cleanup retains runs finished within the last 10 min
RETAIN_SECS = 600

_ERR_TYPE = "Unhandled query run type"
_ERR_HELPER = "Required helper function pganalyze.explain_analyze is not set up"
_ERR_CONNECT = "could not connect to database"


def query_run_workflow(spark: SparkSession) -> DataFrame:
    runs = spark.table("query_run_requests")
    live = F.broadcast(
        spark.table("plan_rows")
        .filter(F.col("plan_type") == "estimate")
        .groupBy("database_oid", "query_id")
        .agg(F.min("plan_text").alias("live_plan"))
    )
    now = spark.table("query_run_requests").agg(
        F.max("requested_at").alias("now_ts")
    )
    j = runs.join(live, on=["database_oid", "query_id"], how="left").crossJoin(
        F.broadcast(now)
    )
    route = (
        F.when(F.col("already_finished"), F.lit("skipped_finished"))
        .when(F.col("run_type") != "explain", F.lit("failed_type"))
        .when(F.col("live_plan").isNull(), F.lit("failed_connect"))
        .when(~F.col("has_helper"), F.lit("failed_helper"))
        .otherwise(F.lit("ran"))
    )
    error = (
        F.when(route == "failed_type", F.lit(_ERR_TYPE))
        .when(route == "failed_connect", F.lit(_ERR_CONNECT))
        .when(route == "failed_helper", F.lit(_ERR_HELPER))
    )
    marker = F.concat(
        F.lit("/* pganalyze:no-alert,pganalyze-query-run:"),
        F.col("run_id").cast("string"),
        F.lit(" */ "),
    )
    return j.select(
        "run_id",
        route.alias("route"),
        error.alias("error"),
        # pid is read only after connect + helper check succeed
        # (query_run.go:95-103)
        F.when(route == "ran", (F.lit(1000) + F.col("run_id") % 200).cast("int"))
        .alias("backend_pid"),
        F.when(route == "ran", marker).alias("marker"),
        F.when(route == "ran", F.col("live_plan")).alias("result"),
        # every processed run finishes at its request time in this batch
        # analog; cleanup keeps it while younger than the TTL
        (
            F.col("requested_at")
            > F.col("now_ts") - F.expr(f"INTERVAL {RETAIN_SECS} SECONDS")
        ).alias("retained"),
    ).orderBy("run_id")


def oracle_query_run_workflow() -> str:
    return f"""
WITH live AS (
  SELECT database_oid, query_id, MIN(plan_text) AS live_plan
  FROM plan_rows WHERE plan_type = 'estimate'
  GROUP BY database_oid, query_id
),
clock AS (SELECT MAX(requested_at) AS now_ts FROM query_run_requests),
routed AS (
  SELECT r.*, l.live_plan, c.now_ts,
    CASE
      WHEN r.already_finished THEN 'skipped_finished'
      WHEN r.run_type <> 'explain' THEN 'failed_type'
      WHEN l.live_plan IS NULL THEN 'failed_connect'
      WHEN NOT r.has_helper THEN 'failed_helper'
      ELSE 'ran'
    END AS route
  FROM query_run_requests r
  LEFT JOIN live l USING (database_oid, query_id)
  CROSS JOIN clock c
)
SELECT run_id, route,
  CASE WHEN route = 'failed_type' THEN '{_ERR_TYPE}'
       WHEN route = 'failed_connect' THEN '{_ERR_CONNECT}'
       WHEN route = 'failed_helper' THEN '{_ERR_HELPER}' END AS error,
  CASE WHEN route = 'ran' THEN CAST(1000 + run_id % 200 AS INT) END AS backend_pid,
  CASE WHEN route = 'ran'
       THEN '/* pganalyze:no-alert,pganalyze-query-run:' || CAST(run_id AS VARCHAR)
            || ' */ ' END AS marker,
  CASE WHEN route = 'ran' THEN live_plan END AS result,
  requested_at > now_ts - INTERVAL {RETAIN_SECS} SECOND AS retained
FROM routed
ORDER BY run_id
"""


# ---------------------------------------------------------------------------
# J13 — the explain_analyze safety guard + retry ladder
# (input/postgres/explain_analyze.go).
#
# validateQuery (:61-86): exactly one statement; SELECT (wCTEs permitted —
# the read-only transaction is the backstop); DML and utility statements
# refused; blocked exfiltration/SQL-injection helper functions refused
# with the offending name (:88-117). The reference classifies via the
# pg_query parse tree; pg_query is unavailable here (the same declared
# fallback as U1/U2), so classification is prefix/regex-based with the
# reference's exact error strings.
#
# RunExplainAnalyzeForQueryRun (:19-46): warm-up EXPLAIN (ANALYZE, TIMING
# OFF); on statement timeout retry the warm-up once; on a second timeout
# fall back to a plain non-ANALYZE EXPLAIN; otherwise the returned result
# is a final EXPLAIN (ANALYZE, BUFFERS).
# ---------------------------------------------------------------------------

BLOCKED_FUNCTIONS = [
    "dblink_connect",
    "dblink_exec",
    "dblink",
    "crosstab2",
    "crosstab3",
    "crosstab4",
    "crosstab",
    "xpath_table",
]

_ERR_PARSE = "query is not permitted to run - failed to parse"
_ERR_MULTI = "query is not permitted to run - multi-statement query string"
_ERR_DML = "query is not permitted to run - DML statement"
_ERR_UTILITY = "query is not permitted to run - utility statement"
_ERR_FUNC = "query is not permitted to run - function not allowed: "

# a name token followed by an open paren; alternation is ordered longest-
# first so dblink_connect never half-matches as dblink
_BLOCKED_RE = "(" + "|".join(BLOCKED_FUNCTIONS) + r")[ ]*\("
_DML_RE = "^(INSERT|UPDATE|DELETE) "
_SELECT_RE = "^(SELECT|WITH) "
_MULTI_RE = "; *[^ ;]"


def explain_analyze_guard(spark: SparkSession) -> DataFrame:
    from collector_spark.functions.utility import UTILITY_PREFIX

    s = spark.table("qr_validate_stmts")
    q = F.col("query_text")
    blocked = F.regexp_extract(q, _BLOCKED_RE, 1)
    error = (
        F.when(q.rlike(_MULTI_RE), F.lit(_ERR_MULTI))
        .when(q.rlike(_DML_RE), F.lit(_ERR_DML))
        .when(q.rlike(UTILITY_PREFIX), F.lit(_ERR_UTILITY))
        .when(~q.rlike(_SELECT_RE), F.lit(_ERR_PARSE))
        .when(blocked != "", F.concat(F.lit(_ERR_FUNC), blocked))
    )
    valid = error.isNull()
    # retry ladder: explain_calls counts pganalyze.explain_analyze
    # invocations; final_flags is what produced the returned result
    calls = (
        F.when(~valid, F.lit(0))
        .when(~F.col("warmup_timeout"), F.lit(2))
        .otherwise(F.lit(3))
    )
    final_flags = F.when(
        valid,
        F.when(
            F.col("warmup_timeout") & F.col("second_timeout"), F.lit("")
        ).otherwise(F.lit("ANALYZE,BUFFERS")),
    )
    return s.select(
        "stmt_id",
        "query_text",
        valid.alias("valid"),
        error.alias("error"),
        calls.cast("int").alias("explain_calls"),
        final_flags.alias("final_flags"),
        (valid & F.col("warmup_timeout") & F.col("second_timeout")).alias(
            "degraded_to_plain_explain"
        ),
    ).orderBy("stmt_id")


def oracle_explain_analyze_guard() -> str:
    from collector_spark.functions.utility import UTILITY_PREFIX

    return f"""
WITH classified AS (
  SELECT s.*, regexp_extract(s.query_text, '{_BLOCKED_RE}', 1) AS blocked,
    CASE
      WHEN regexp_matches(s.query_text, '{_MULTI_RE}') THEN '{_ERR_MULTI}'
      WHEN regexp_matches(s.query_text, '{_DML_RE}') THEN '{_ERR_DML}'
      WHEN regexp_matches(s.query_text, '{UTILITY_PREFIX}') THEN '{_ERR_UTILITY}'
      WHEN NOT regexp_matches(s.query_text, '{_SELECT_RE}') THEN '{_ERR_PARSE}'
      WHEN regexp_extract(s.query_text, '{_BLOCKED_RE}', 1) <> ''
        THEN '{_ERR_FUNC}' || regexp_extract(s.query_text, '{_BLOCKED_RE}', 1)
    END AS error
  FROM qr_validate_stmts s
)
SELECT stmt_id, query_text,
  error IS NULL AS valid,
  error,
  CAST(CASE WHEN error IS NOT NULL THEN 0
            WHEN NOT warmup_timeout THEN 2 ELSE 3 END AS INT) AS explain_calls,
  CASE WHEN error IS NULL
       THEN CASE WHEN warmup_timeout AND second_timeout THEN ''
                 ELSE 'ANALYZE,BUFFERS' END END AS final_flags,
  error IS NULL AND warmup_timeout AND second_timeout AS degraded_to_plain_explain
FROM classified
ORDER BY stmt_id
"""
