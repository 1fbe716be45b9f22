"""Historic time-bucket operators (A12 accumulation, A13 latest/historic
split, P10 stale-bucket TTL, W5 bucket ordering, ST10 tumbling windows).

Reference: input/full_1min.go:39-62 stores each 1-minute counter diff under
a (collected_at, collected_interval_secs) time key; output/transform/
postgres_statements.go:91-136 then (a) drops buckets older than one hour,
(b) sorts buckets by collected time, and (c) splits the newest bucket into
the "latest" statistics with the remainder becoming historic.

Spark shape: the per-minute observations are a keyed time series; the
bucket diff is a lag window per key (one shuffle by key), and the
TTL/latest logic anchors on the max bucket time via a 1-row broadcast
(deterministic "now" — the reference uses wall clock, which an oracle
cannot reproduce). At scale the lag window partitions by statement key —
high cardinality, no skew; nothing here is driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEFAULT_INTERVAL_SECS = 60


def bucket_accumulation(spark: SparkSession) -> DataFrame:
    """A12: per-bucket counter deltas keyed by (collected_at, interval).

    First-run semantics of diffStatements (input/full_1min.go:67-87): the
    globally first bucket produces no diffs; keys first seen later count in
    full (new-statement-on-follow-up); only Calls > 0 rows are kept.
    """
    obs = spark.table("stmt_minute_obs")
    w = Window.partitionBy("key").orderBy("minute_ts")
    first_bucket = obs.agg(F.min("minute_ts").alias("__first_bucket"))
    d = obs.select(
        "key",
        "minute_ts",
        "calls_cum",
        "rows_cum",
        F.lag("calls_cum").over(w).alias("prev_calls"),
        F.lag("rows_cum").over(w).alias("prev_rows"),
        F.lag("minute_ts").over(w).alias("prev_ts"),
    ).crossJoin(F.broadcast(first_bucket))
    calls = F.when(F.col("prev_calls").isNull(), F.col("calls_cum")).otherwise(
        F.col("calls_cum") - F.col("prev_calls")
    )
    rows = F.when(F.col("prev_rows").isNull(), F.col("rows_cum")).otherwise(
        F.col("rows_cum") - F.col("prev_rows")
    )
    interval = F.when(
        F.col("prev_ts").isNull(), F.lit(DEFAULT_INTERVAL_SECS).cast("long")
    ).otherwise(F.unix_timestamp("minute_ts") - F.unix_timestamp("prev_ts"))
    return (
        d.filter(F.col("minute_ts") > F.col("__first_bucket"))
        .select(
            F.col("minute_ts").alias("collected_at"),
            interval.cast("long").alias("interval_secs"),
            F.col("key"),
            calls.cast("long").alias("calls"),
            rows.cast("long").alias("rows"),
        )
        .filter(F.col("calls") > 0)
    )


def bucket_accumulation_q(spark: SparkSession) -> DataFrame:
    return bucket_accumulation(spark).orderBy("collected_at", "key")


def _oracle_buckets() -> str:
    return f"""
WITH d AS (
  SELECT key, minute_ts, calls_cum, rows_cum,
    lag(calls_cum) OVER w AS prev_calls,
    lag(rows_cum) OVER w AS prev_rows,
    lag(minute_ts) OVER w AS prev_ts
  FROM stmt_minute_obs
  WINDOW w AS (PARTITION BY key ORDER BY minute_ts)
),
b AS (
  SELECT minute_ts AS collected_at,
    CAST(CASE WHEN prev_ts IS NULL THEN {DEFAULT_INTERVAL_SECS}
         ELSE CAST(floor(epoch(minute_ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT)
         END AS BIGINT) AS interval_secs,
    key,
    CAST(CASE WHEN prev_calls IS NULL THEN calls_cum ELSE calls_cum - prev_calls END AS BIGINT) AS calls,
    CAST(CASE WHEN prev_rows IS NULL THEN rows_cum ELSE rows_cum - prev_rows END AS BIGINT) AS rows
  FROM d
  WHERE minute_ts > (SELECT MIN(minute_ts) FROM stmt_minute_obs)
)
SELECT * FROM b WHERE calls > 0
"""


def oracle_bucket_accumulation() -> str:
    return f"SELECT * FROM ({_oracle_buckets()}) q ORDER BY collected_at, key"


def schedule_suppression(spark: SparkSession) -> DataFrame:
    """ST6: the 1-minute run is skipped when it coincides with the 10-minute
    full run, which collects the same stats inline (scheduler/scheduler.go:
    79-109, input/full.go:68-89) — buckets at 10-minute marks are owned by
    the full snapshot, so the high-frequency path drops them."""
    b = bucket_accumulation(spark)
    return (
        b.filter(F.minute("collected_at") % 10 != 0)
        .orderBy("collected_at", "key")
    )


def oracle_schedule_suppression() -> str:
    return f"""
SELECT * FROM ({_oracle_buckets()}) q
WHERE CAST(EXTRACT(minute FROM collected_at) AS INT) % 10 <> 0
ORDER BY collected_at, key
"""


def latest_split(spark: SparkSession) -> DataFrame:
    """A13 + P10 + W5: drop buckets older than 1 h (anchored on the max
    bucket, the oracle-reproducible 'now'), flag the newest bucket as the
    latest statistics, remainder historic."""
    b = bucket_accumulation(spark)
    mx = b.agg(F.max("collected_at").alias("__max_ts"))
    j = b.crossJoin(F.broadcast(mx))
    return (
        j.filter(F.col("collected_at") > F.expr("__max_ts - INTERVAL 1 HOUR"))
        .select(
            "collected_at",
            "interval_secs",
            "key",
            "calls",
            "rows",
            (F.col("collected_at") == F.col("__max_ts")).alias("is_latest"),
        )
        .orderBy("collected_at", "key")
    )


def oracle_latest_split() -> str:
    return f"""
WITH b AS ({_oracle_buckets()}),
mx AS (SELECT MAX(collected_at) AS max_ts FROM b)
SELECT b.collected_at, b.interval_secs, b.key, b.calls, b.rows,
       b.collected_at = mx.max_ts AS is_latest
FROM b CROSS JOIN mx
WHERE b.collected_at > mx.max_ts - INTERVAL 1 HOUR
ORDER BY b.collected_at, b.key
"""


def bucket_gapfill(spark: SparkSession, key_mod: int | None = None) -> DataFrame:
    """A12b: dense per-key minute series — the consumer-side gap fill the
    dashboards need over A12's sparse buckets (a key with no calls in a
    minute simply has no row; plotting/rate math wants explicit zeros).

    Grid generation is sequence+explode over each key's OWN observed
    [first, last] span (not the global span — at 100 TB the grid relation
    stays proportional to real key activity, and a key's pre-first/post-
    last silence carries no information). One shuffle: the grid-to-bucket
    left join on (key, minute); the span aggregate is map-side
    combinable and broadcasts per-key bounds nowhere — it IS the left
    side of the join.
    """
    b = bucket_accumulation(spark)
    if key_mod is not None:
        # registered form: a deterministic key subsample bounds the grid
        # the driver hash-compares (the full grid is ~2M rows at sf0.01);
        # production runs key_mod=None
        b = b.filter(F.col("key") % key_mod == 0)
    spans = b.groupBy("key").agg(
        F.min("collected_at").alias("first_ts"),
        F.max("collected_at").alias("last_ts"),
    )
    grid = spans.select(
        "key",
        F.explode(
            F.sequence("first_ts", "last_ts", F.expr("INTERVAL 1 MINUTE"))
        ).alias("collected_at"),
    )
    return (
        grid.join(
            b.select("key", "collected_at", "calls", "rows"),
            on=["key", "collected_at"],
            how="left",
        )
        .select(
            "key",
            "collected_at",
            F.coalesce("calls", F.lit(0)).cast("long").alias("calls"),
            F.coalesce("rows", F.lit(0)).cast("long").alias("rows"),
            F.col("calls").isNotNull().alias("observed"),
        )
        .orderBy("key", "collected_at")
    )


def oracle_bucket_gapfill(key_mod: int | None = None) -> str:
    flt = f"WHERE key % {key_mod} = 0" if key_mod is not None else ""
    return f"""
WITH b AS (SELECT * FROM ({_oracle_buckets()}) bb {flt}),
spans AS (
  SELECT key, MIN(collected_at) AS first_ts, MAX(collected_at) AS last_ts
  FROM b GROUP BY key
),
grid AS (
  SELECT key, unnest(generate_series(first_ts, last_ts, INTERVAL 1 MINUTE))
    AS collected_at
  FROM spans
)
SELECT g.key, g.collected_at,
  CAST(COALESCE(b.calls, 0) AS BIGINT) AS calls,
  CAST(COALESCE(b.rows, 0) AS BIGINT) AS rows,
  b.calls IS NOT NULL AS observed
FROM grid g
LEFT JOIN b ON b.key = g.key AND b.collected_at = g.collected_at
ORDER BY g.key, g.collected_at
"""
