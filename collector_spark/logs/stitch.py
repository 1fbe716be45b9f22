"""W3 — multi-line continuation stitching (logs/stream/stream.go:202-231,
logs/stitch.go:19-57).

Continuation lines (no prefix -> log_level UNKNOWN) append to the pending
primary line of the same pid. The reference does an ordered fold over a
per-pid buffer; the Spark shape is a running-max window (last primary seq at
or before each row) followed by an ordered group concat — one shuffle by
pid, then map-side work.

Unattributable continuations (no preceding primary in the partition) are
discarded, mirroring the late-data drop (ST4, stream.go:84-90).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from collector_spark.logs.parse import parse_lines


def stitch_lines(spark: SparkSession) -> DataFrame:
    return stitch_df(parse_lines(spark))


def stitch_df(lines: DataFrame) -> DataFrame:
    """Stitch any parsed-lines-shaped frame (pid, seq, log_level, username,
    database, application, content)."""
    w = (
        Window.partitionBy("pid")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    primary_seq = F.max(
        F.when(F.col("log_level") != "UNKNOWN", F.col("seq"))
    ).over(w)
    grouped = lines.withColumn("group_seq", primary_seq).filter(
        F.col("group_seq").isNotNull()
    )

    def of_primary(c: str):
        return F.max(F.when(F.col("seq") == F.col("group_seq"), F.col(c))).alias(c)

    stitched_content = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("seq", "content"))),
            lambda x: x.content,
        ),
        "\n",
    ).alias("content")

    return (
        grouped.groupBy("pid", F.col("group_seq").alias("seq"))
        .agg(
            of_primary("log_level"),
            of_primary("username"),
            of_primary("database"),
            of_primary("application"),
            stitched_content,
            F.count("*").alias("line_count"),
        )
    )


def stitch_lines_q(spark: SparkSession) -> DataFrame:
    return stitch_lines(spark).orderBy("pid", "seq")


def oracle_stitch_lines(parsed_cte: str) -> str:
    """DuckDB equivalent; ``parsed_cte`` is SQL producing the parsed lines."""
    return f"""
WITH parsed AS ({parsed_cte}),
grouped AS (
  SELECT *,
    MAX(CASE WHEN log_level <> 'UNKNOWN' THEN seq END)
      OVER (PARTITION BY pid ORDER BY seq
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS group_seq
  FROM parsed
)
SELECT pid, group_seq AS seq,
  MAX(CASE WHEN seq = group_seq THEN log_level END) AS log_level,
  MAX(CASE WHEN seq = group_seq THEN username END) AS username,
  MAX(CASE WHEN seq = group_seq THEN database END) AS database,
  MAX(CASE WHEN seq = group_seq THEN application END) AS application,
  string_agg(content, chr(10) ORDER BY seq) AS content,
  CAST(COUNT(*) AS BIGINT) AS line_count
FROM grouped
WHERE group_seq IS NOT NULL
GROUP BY pid, group_seq
ORDER BY pid, seq
"""
