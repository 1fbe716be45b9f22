"""Snapshot assembly: star-schema emit + integrity check + partitioned sink
(SURVEY §7.2 step 6).

Reference: output/transform/transform.go builds the FullSnapshot protobuf —
dimension arrays (roles, databases, queries) with dense int32 idx, fact
arrays referencing them — and output/full.go:26-33 verifies integrity
(every fact idx within dimension bounds) before emitting. The sink here is
partitioned parquet instead of protobuf-over-websocket: same star schema,
cluster-native format.

Scale: dimensions are per-server small (J10 note); facts join to them via
broadcast. The sink partitions by database_oid — the reference's natural
tenant key — so downstream reads prune partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collector_spark.core.dims import dense_index
from collector_spark.core.pinned import pinned
from collector_spark.operators.statements import (
    oracle_statement_rollup,
    statement_rollup,
)


def _dense_dim(df: DataFrame, key_cols: list[str], idx_name: str) -> DataFrame:
    """J10 dense-idx builder: sorted distinct keys -> 0-based int32 idx,
    assigned by the scalable two-level rank (core/dims.py) — no
    single-partition window even for the fingerprint dim."""
    return dense_index(df, key_cols, idx_name)


# The rollup feeds three dimension builds plus the fact join (~7 lineage
# evaluations of the full statement pipeline otherwise); it is tiny (one
# row per fingerprint group), so pin it via the shared input-keyed cache
# (core/pinned.py).
def _persisted_rollup(spark: SparkSession) -> DataFrame:
    return pinned(spark, "statement_rollup", lambda: statement_rollup(spark))


def assemble_statement_fact(spark: SparkSession) -> DataFrame:
    """The star-schema statement fact: rollup rows with dense dimension
    idx for database, role, and query."""
    rollup = _persisted_rollup(spark)
    db_dim = _dense_dim(rollup, ["database_oid"], "database_idx")
    role_dim = _dense_dim(rollup, ["user_oid"], "role_idx")
    query_dim = _dense_dim(rollup, ["fingerprint"], "query_idx")
    return (
        rollup.join(F.broadcast(db_dim), on="database_oid")
        .join(F.broadcast(role_dim), on="user_oid")
        .join(F.broadcast(query_dim), on="fingerprint")
        .select(
            "query_idx",
            "database_idx",
            "role_idx",
            "database_oid",
            "user_oid",
            "fingerprint",
            "toplevel",
            "calls",
            F.col("total_time").cast("double").alias("total_time"),
            "rows",
        )
        .orderBy("query_idx", "database_idx", "role_idx", "toplevel")
    )


def oracle_statement_fact() -> str:
    rollup = oracle_statement_rollup()
    return f"""
WITH rollup AS ({rollup}),
db_dim AS (
  SELECT database_oid,
    CAST(row_number() OVER (ORDER BY database_oid) - 1 AS INT) AS database_idx
  FROM (SELECT DISTINCT database_oid FROM rollup)
),
role_dim AS (
  SELECT user_oid,
    CAST(row_number() OVER (ORDER BY user_oid) - 1 AS INT) AS role_idx
  FROM (SELECT DISTINCT user_oid FROM rollup)
),
query_dim AS (
  SELECT fingerprint,
    CAST(row_number() OVER (ORDER BY fingerprint) - 1 AS INT) AS query_idx
  FROM (SELECT DISTINCT fingerprint FROM rollup)
)
SELECT q.query_idx, d.database_idx, r.role_idx,
       f.database_oid, f.user_oid, f.fingerprint, f.toplevel,
       f.calls, CAST(f.total_time AS DOUBLE) AS total_time, f.rows
FROM rollup f
JOIN db_dim d USING (database_oid)
JOIN role_dim r USING (user_oid)
JOIN query_dim q USING (fingerprint)
ORDER BY q.query_idx, d.database_idx, r.role_idx, f.toplevel
"""


def verify_integrity(fact: DataFrame) -> None:
    """output/full.go:26-33 analog: every fact idx must be present and
    non-negative, and idx spaces must be dense (max idx + 1 == distinct
    count). Raises on violation."""
    checks = fact.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(
                F.col("query_idx").isNull()
                | F.col("database_idx").isNull()
                | F.col("role_idx").isNull()
                | (F.col("query_idx") < 0)
                | (F.col("database_idx") < 0)
                | (F.col("role_idx") < 0),
                1,
            ).otherwise(0)
        ).alias("bad_idx"),
        (F.max("query_idx") + 1 - F.count_distinct("query_idx")).alias("q_gap"),
        (F.max("database_idx") + 1 - F.count_distinct("database_idx")).alias("d_gap"),
        (F.max("role_idx") + 1 - F.count_distinct("role_idx")).alias("r_gap"),
    ).collect()[0]
    if checks["n"] == 0:
        raise ValueError("snapshot integrity: empty fact")
    if checks["bad_idx"]:
        raise ValueError(f"snapshot integrity: {checks['bad_idx']} rows with bad idx")
    for gap in ("q_gap", "d_gap", "r_gap"):
        if checks[gap] != 0:
            raise ValueError(f"snapshot integrity: non-dense idx space ({gap})")


# ---------------------------------------------------------------------------
# Plan fact: QueryPlanReference + Information + Statistic flattened
# (output/transform/postgres_plans.go:22-117).
#
# groupPlans semantics: plan rows keyed by (database, user, query_id,
# plan_id) are re-keyed to the statement dimension's fingerprint-dense
# query_idx, so multiple query_ids sharing one fingerprint land in one
# (query_idx, plan_id) group — their statistics ADD (postgres_plans.go:55-68)
# while the most recently captured plan supplies the text/type/captured-time
# (ties broken by (plan_text, plan_type) DESC for an engine-independent total
# order; the reference's tie outcome is Go map iteration order). Keys whose
# statement is absent from the dimension are dropped (:43-47 — the
# deallocated-statement guard; here the collector-marker texts that P6
# filters out of the rollup). plan_idx is the dense sorted rank over
# (query_idx, plan_id), replacing the reference's insertion order with a
# total order like every other snapshot fact.
#
# Scale: stats sum + winner selection ride ONE shuffle on (query_idx,
# plan_id) — the winner is a row_number and the sums are unordered-frame
# window aggregates over the same partitioning, so no second pass over the
# plan relation. The fingerprint key map and both dims are bounded by
# pg_stat_statements.max per server (reference resets above ~90% of max) —
# the query dim is explicitly broadcast; the key map join is left to AQE
# like the J1 text join.
# ---------------------------------------------------------------------------

PLAN_TYPE_ENUM = {"no plan": 0, "estimate": 1, "actual": 2}


def snapshot_plan_fact(spark: SparkSession) -> DataFrame:
    from pyspark.sql.window import Window

    from collector_spark.operators.plans import PLAN_TYPES

    rollup = _persisted_rollup(spark)
    query_dim = _dense_dim(rollup, ["fingerprint"], "query_idx")

    # key -> fingerprint map straight off the PINNED rollup's contributing
    # query_ids (A2 collects them per group): no re-render of the text
    # relation, no second fingerprint pass — the reference builds
    # queryIDKeyToIdx from the transformed statement groups the same way
    # (postgres_statements.go), and the rollup has already dropped the
    # collector-marker texts (P6) and folded text-less keys into the
    # unavailable-fingerprint group.
    key_fp = (
        rollup.select(
            "database_oid",
            "user_oid",
            "fingerprint",
            F.explode(F.split("query_ids", ",")).alias("qid"),
        )
        .filter(F.col("qid") != "")
        .select(
            "database_oid",
            "user_oid",
            F.col("qid").cast("long").alias("query_id"),
            "fingerprint",
        )
        .distinct()
    )

    base = (
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
            # keep DECIMAL through the window sum: exact, order-insensitive
            # (float sums are not associative — cast to double only after)
            "total_time",
            "plan_captured_date",
        )
    )
    keyed = base.join(
        key_fp, on=["database_oid", "user_oid", "query_id"]
    ).join(F.broadcast(query_dim), on="fingerprint")

    grp = Window.partitionBy("query_idx", "plan_id")
    ordered = grp.orderBy(
        F.desc("plan_captured_date"), F.desc("plan_text"), F.desc("plan_type")
    )
    winners = (
        keyed.withColumn("rn", F.row_number().over(ordered))
        .withColumn("calls_sum", F.sum("calls").over(grp))
        .withColumn("total_time_sum", F.sum("total_time").over(grp))
        .filter(F.col("rn") == 1)
    )

    plan_dim = _dense_dim(winners, ["query_idx", "plan_id"], "plan_idx")
    enum_expr = F.when(F.col("plan_type") == "estimate", F.lit(1)).when(
        F.col("plan_type") == "actual", F.lit(2)
    ).otherwise(F.lit(0))
    return (
        winners.join(F.broadcast(plan_dim), on=["query_idx", "plan_id"])
        .select(
            "plan_idx",
            "query_idx",
            F.col("plan_id").alias("original_plan_id"),
            "plan_type",
            enum_expr.cast("int").alias("plan_type_enum"),
            F.col("plan_text").alias("explain_plan"),
            "plan_captured_date",
            F.col("calls_sum").cast("long").alias("calls"),
            F.col("total_time_sum").cast("double").alias("total_time"),
        )
        .orderBy("plan_idx")
    )


def oracle_plan_fact() -> str:
    from collector_spark.operators.plans import PLAN_TYPES

    rollup = oracle_statement_rollup()
    types = ", ".join(f"'{t}'" for t in PLAN_TYPES)
    return f"""
WITH rollup AS ({rollup}),
query_dim AS (
  SELECT fingerprint,
    CAST(row_number() OVER (ORDER BY fingerprint) - 1 AS INT) AS query_idx
  FROM (SELECT DISTINCT fingerprint FROM rollup)
),
key_fp AS (
  SELECT DISTINCT database_oid, user_oid,
    CAST(q.qid AS BIGINT) AS query_id, fingerprint
  FROM rollup, LATERAL (SELECT unnest(string_split(query_ids, ',')) AS qid) q
  WHERE q.qid <> ''
),
keyed AS (
  SELECT q.query_idx, b.plan_id, b.plan_type, b.plan_text,
         b.plan_captured_date, b.calls, b.total_time
  FROM plan_rows b
  JOIN key_fp k USING (database_oid, user_oid, query_id)
  JOIN query_dim q USING (fingerprint)
  WHERE b.plan_type IN ({types})
),
winners AS (
  SELECT *,
    row_number() OVER (
      PARTITION BY query_idx, plan_id
      ORDER BY plan_captured_date DESC, plan_text DESC, plan_type DESC
    ) AS rn,
    CAST(SUM(calls) OVER (PARTITION BY query_idx, plan_id) AS BIGINT)
      AS calls_sum,
    CAST(CAST(SUM(total_time) OVER (PARTITION BY query_idx, plan_id)
              AS DECIMAL(38,2)) AS DOUBLE) AS total_time_sum
  FROM keyed
),
plan_dim AS (
  SELECT query_idx, plan_id,
    CAST(row_number() OVER (ORDER BY query_idx, plan_id) - 1 AS INT)
      AS plan_idx
  FROM (SELECT DISTINCT query_idx, plan_id FROM winners WHERE rn = 1)
)
SELECT d.plan_idx, w.query_idx, w.plan_id AS original_plan_id,
  w.plan_type,
  CAST(CASE w.plan_type WHEN 'estimate' THEN 1 WHEN 'actual' THEN 2
       ELSE 0 END AS INT) AS plan_type_enum,
  w.plan_text AS explain_plan, w.plan_captured_date,
  w.calls_sum AS calls, w.total_time_sum AS total_time
FROM winners w
JOIN plan_dim d USING (query_idx, plan_id)
WHERE w.rn = 1
ORDER BY d.plan_idx
"""


def write_snapshot(spark: SparkSession, path: str) -> None:
    """Integrity-checked partitioned parquet sink."""
    fact = assemble_statement_fact(spark)
    verify_integrity(fact)
    fact.write.mode("overwrite").partitionBy("database_oid").parquet(path)
