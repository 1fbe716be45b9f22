"""Log-line parsing (logs/parse.go:212,461-533) as pure regexp projection.

The compiled prefix regex (U9) runs inside JVM codegen via
``regexp_extract`` — no Python in the per-line path. Unmatched lines keep
log_level = 'UNKNOWN' and their raw content; the stitcher (W3) later folds
them into the preceding primary line of the same pid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collector_spark.logs.prefix import DEFAULT_PREFIX, compile_prefix

PARSE_REGEX, PARSE_GROUPS = compile_prefix(DEFAULT_PREFIX)


def parse_lines(spark: SparkSession) -> DataFrame:
    """log_raw -> parsed columns. UNKNOWN level marks continuation lines."""
    raw = spark.table("log_raw")
    matched = F.col("raw_line").rlike(PARSE_REGEX)
    cols = {
        name: F.regexp_extract(F.col("raw_line"), PARSE_REGEX, i + 1)
        for i, name in enumerate(PARSE_GROUPS)
    }
    return raw.select(
        "collected_at",
        "pid",
        "seq",
        F.when(matched, cols["occurred_at"]).alias("occurred_at_text"),
        F.when(matched, cols["username"]).alias("username"),
        F.when(matched, cols["database"]).alias("database"),
        F.when(matched, cols["application"]).alias("application"),
        F.when(matched, cols["log_level"]).otherwise(F.lit("UNKNOWN")).alias("log_level"),
        F.when(matched, cols["content"]).otherwise(F.col("raw_line")).alias("content"),
    )


def parse_lines_q(spark: SparkSession) -> DataFrame:
    return parse_lines(spark).orderBy("pid", "seq")


def _oracle_regex() -> str:
    return PARSE_REGEX.replace("'", "''")


def oracle_parse_lines() -> str:
    rx = _oracle_regex()
    idx = {name: i + 1 for i, name in enumerate(PARSE_GROUPS)}
    return f"""
SELECT collected_at, pid, seq,
  CASE WHEN regexp_matches(raw_line, '{rx}') THEN regexp_extract(raw_line, '{rx}', {idx['occurred_at']}) END AS occurred_at_text,
  CASE WHEN regexp_matches(raw_line, '{rx}') THEN regexp_extract(raw_line, '{rx}', {idx['username']}) END AS username,
  CASE WHEN regexp_matches(raw_line, '{rx}') THEN regexp_extract(raw_line, '{rx}', {idx['database']}) END AS database,
  CASE WHEN regexp_matches(raw_line, '{rx}') THEN regexp_extract(raw_line, '{rx}', {idx['application']}) END AS application,
  CASE WHEN regexp_matches(raw_line, '{rx}') THEN regexp_extract(raw_line, '{rx}', {idx['log_level']}) ELSE 'UNKNOWN' END AS log_level,
  CASE WHEN regexp_matches(raw_line, '{rx}') THEN regexp_extract(raw_line, '{rx}', {idx['content']}) ELSE raw_line END AS content
FROM log_raw
ORDER BY pid, seq
"""
