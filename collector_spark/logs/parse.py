"""Log-line parsing (logs/parse.go:212,461-533) as pure regexp projection.

The compiled prefix regex (U9) runs inside JVM codegen — no Python in the
per-line path. Unmatched lines keep log_level = 'UNKNOWN' and their raw
content; the stitcher (W3) later folds them into the preceding primary line
of the same pid.

Single-pass extraction: Spark does not CSE regex across expressions, so one
``rlike`` + N ``regexp_extract`` would evaluate the (expensive, anchored)
prefix pattern N+1 times per row. Instead one ``regexp_replace`` rewrites a
matched line into MARK + SEP-joined capture groups; a cheap split then
yields every field, and the MARK sentinel doubles as the matched flag. One
regex evaluation per line — this is the hottest per-row path in the engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from collector_spark.logs.prefix import DEFAULT_PREFIX, compile_prefix

PARSE_REGEX, PARSE_GROUPS = compile_prefix(DEFAULT_PREFIX)

# control chars that never occur in postgres log text
_SEP = "\x01"
_MARK = "\x02"


def parse_lines(spark: SparkSession) -> DataFrame:
    """log_raw -> parsed columns. UNKNOWN level marks continuation lines."""
    return parse_df(spark.table("log_raw"))


def parse_df(raw: DataFrame) -> DataFrame:
    """Parse a (collected_at, pid, seq, raw_line) frame — batch OR streaming
    (pure projection, so the same plan runs under readStream)."""
    # anchored pattern -> at most one match, so replace == rewrite-if-match
    replacement = _MARK + "".join(
        f"{_SEP}${i + 1}" for i in range(len(PARSE_GROUPS))
    )
    rewritten = F.regexp_replace(F.col("raw_line"), PARSE_REGEX, replacement)
    matched = F.startswith(rewritten, F.lit(_MARK))
    parts = F.split(rewritten, _SEP)

    def grp(name: str) -> Column:
        # F.get is 0-based and null-safe on out-of-bounds (unmatched lines
        # split into a single element), ANSI mode included
        return F.get(parts, PARSE_GROUPS.index(name) + 1)

    return raw.select(
        "collected_at",
        "pid",
        "seq",
        F.when(matched, grp("occurred_at")).alias("occurred_at_text"),
        F.when(matched, grp("username")).alias("username"),
        F.when(matched, grp("database")).alias("database"),
        F.when(matched, grp("application")).alias("application"),
        F.when(matched, grp("log_level")).otherwise(F.lit("UNKNOWN")).alias("log_level"),
        F.when(matched, grp("content")).otherwise(F.col("raw_line")).alias("content"),
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
