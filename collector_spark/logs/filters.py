"""Log-line filter operators (P7, P12) + tz timestamp parse (§2.7).

  P7  early ignore (state/state.go:389-401): when volume-reduction flags
      are set, statement/duration/execute content is dropped before any
      further log analysis.
  P12 time-window filter (logs/parse.go:489-494): lines older than
      ``linesNewerThan`` are discarded. The anchor here is the max
      collected_at minus a fixed window (the oracle-reproducible "now").
  §2.7 date/time: occurred_at is parsed from the prefix text into a real
      timestamp (the reference parses in log_timezone and normalizes;
      the fixture renders UTC), and the collection lag is derived.

All pure projections/filters — pushed into the scan by Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collector_spark.logs.parse import parse_lines

IGNORE_PREFIXES = ("statement: ", "duration: ", "execute ")
WINDOW_DAYS = 25


def early_ignore(spark: SparkSession) -> DataFrame:
    """P7: drop high-volume statement/duration/execute lines."""
    lines = parse_lines(spark)
    drop = None
    for p in IGNORE_PREFIXES:
        c = F.col("content").startswith(p)
        drop = c if drop is None else (drop | c)
    return (
        lines.filter(~drop)
        .select("pid", "seq", "log_level", "content")
        .orderBy("pid", "seq")
    )


def oracle_early_ignore(parsed_cte: str) -> str:
    conds = " OR ".join(f"starts_with(content, '{p}')" for p in IGNORE_PREFIXES)
    return f"""
WITH parsed AS ({parsed_cte})
SELECT pid, seq, log_level, content
FROM parsed WHERE NOT ({conds})
ORDER BY pid, seq
"""


def time_window(spark: SparkSession) -> DataFrame:
    """P12 + tz parse: keep lines inside the retention window, with the
    occurred_at text turned into a timestamp and the collection lag."""
    lines = parse_lines(spark).filter(F.col("occurred_at_text").isNotNull())
    occurred = F.to_timestamp(F.replace("occurred_at_text", F.lit(" UTC"), F.lit("")))
    anchor = lines.agg(
        (F.max("collected_at") - F.expr(f"INTERVAL {WINDOW_DAYS} DAYS")).alias("__cutoff")
    )
    return (
        lines.withColumn("occurred_at", occurred)
        .crossJoin(F.broadcast(anchor))
        .filter(F.col("occurred_at") > F.col("__cutoff"))
        .select(
            "pid",
            "seq",
            "occurred_at",
            (F.unix_timestamp("collected_at") - F.unix_timestamp("occurred_at"))
            .cast("long")
            .alias("collection_lag_secs"),
        )
        .orderBy("pid", "seq")
    )


def oracle_time_window(parsed_cte: str) -> str:
    return f"""
WITH parsed AS ({parsed_cte}),
p2 AS (
  SELECT pid, seq, collected_at,
    CAST(replace(occurred_at_text, ' UTC', '') AS TIMESTAMP) AS occurred_at
  FROM parsed WHERE occurred_at_text IS NOT NULL
),
anchor AS (SELECT MAX(collected_at) - INTERVAL {WINDOW_DAYS} DAYS AS cutoff FROM p2)
SELECT pid, seq, occurred_at,
  CAST(CAST(floor(epoch(collected_at)) AS BIGINT)
       - CAST(floor(epoch(occurred_at)) AS BIGINT) AS BIGINT) AS collection_lag_secs
FROM p2 CROSS JOIN anchor
WHERE occurred_at > cutoff
ORDER BY pid, seq
"""
