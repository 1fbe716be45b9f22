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
