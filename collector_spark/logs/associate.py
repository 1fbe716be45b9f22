"""W4/J8 — secondary-line association (logs/analyze.go:2248-2294).

STATEMENT/DETAIL/HINT/CONTEXT/QUERY lines attach to the nearest preceding
primary line of the same pid, at most 4 rows back (the reference scans <= 4
lines ahead from each primary — the inverse view of the same relation).

Spark shape: one window over (pid, seq) — a sequence as-of join, no
self-join needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from collector_spark.logs.stitch import stitch_lines

SECONDARY_LEVELS = ("DETAIL", "HINT", "CONTEXT", "STATEMENT", "QUERY")
LOOKAHEAD = 4


def associate_secondaries(spark: SparkSession) -> DataFrame:
    lines = stitch_lines(spark)
    is_secondary = F.col("log_level").isin(*SECONDARY_LEVELS)
    w = (
        Window.partitionBy("pid")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_rn = lines.withColumn(
        "rn", F.row_number().over(Window.partitionBy("pid").orderBy("seq"))
    )
    prim_seq = F.max(F.when(~is_secondary, F.col("seq"))).over(w)
    prim_rn = F.max(F.when(~is_secondary, F.col("rn"))).over(w)
    out = (
        with_rn.withColumn("primary_seq", prim_seq)
        .withColumn("primary_rn", prim_rn)
        .filter(
            is_secondary
            & F.col("primary_rn").isNotNull()
            & ((F.col("rn") - F.col("primary_rn")) <= LOOKAHEAD)
        )
        .select(
            "pid",
            "primary_seq",
            F.col("seq").alias("secondary_seq"),
            F.col("log_level").alias("secondary_level"),
            F.col("content").alias("secondary_content"),
        )
    )
    return out


def associate_secondaries_q(spark: SparkSession) -> DataFrame:
    return associate_secondaries(spark).orderBy("pid", "secondary_seq")


def oracle_associate(stitched_cte: str) -> str:
    levels = ", ".join(f"'{lv}'" for lv in SECONDARY_LEVELS)
    return f"""
WITH stitched AS ({stitched_cte}),
numbered AS (
  SELECT *, row_number() OVER (PARTITION BY pid ORDER BY seq) AS rn
  FROM stitched
),
tagged AS (
  SELECT *,
    MAX(CASE WHEN log_level NOT IN ({levels}) THEN seq END)
      OVER (PARTITION BY pid ORDER BY seq ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS primary_seq,
    MAX(CASE WHEN log_level NOT IN ({levels}) THEN rn END)
      OVER (PARTITION BY pid ORDER BY seq ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS primary_rn
  FROM numbered
)
SELECT pid, primary_seq, seq AS secondary_seq,
       log_level AS secondary_level, content AS secondary_content
FROM tagged
WHERE log_level IN ({levels})
  AND primary_rn IS NOT NULL AND rn - primary_rn <= {LOOKAHEAD}
ORDER BY pid, secondary_seq
"""
