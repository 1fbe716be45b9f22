"""U7 — log-event classification rule engine.

The reference classifies ~110 event types with prefix-bucketed regex
dispatch (logs/analyze.go:33-1183, dispatch at :2078-2213): a literal
prefix check short-circuits before the (expensive) regex runs. Here the
rule table is DATA, and both the Spark when-chain and the DuckDB oracle
CASE are generated from it — same pattern, two renderings, zero drift.
Everything stays JVM-side (startswith + regexp_extract inside whole-stage
codegen); Catalyst will not reorder regex cost itself (SURVEY.md §4), so
the prefix short-circuit is encoded explicitly in each branch.

Details are extracted into typed columns (detail_num DOUBLE, detail_text)
rather than a map so the oracle can compare them value-by-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from collector_spark.logs.rules import RULES, Rule
from collector_spark.logs.stitch import stitch_lines

PRIMARY_LEVELS = ("LOG", "ERROR", "FATAL", "WARNING", "PANIC", "NOTICE")


def _match(rule: Rule) -> Column:
    return F.col("content").startswith(rule.prefix) & F.col("content").rlike(rule.regex)


def classify(spark: SparkSession) -> DataFrame:
    lines = stitch_lines(spark).filter(F.col("log_level").isin(*PRIMARY_LEVELS))

    # Pass 1: one prefix-short-circuited when-chain assigns the class.
    cls: Column = F.lit("UNCLASSIFIED")
    for r in reversed(RULES):
        cls = F.when(_match(r), F.lit(r.classification)).otherwise(cls)
    classified = lines.select(
        "pid", "seq", "log_level", "content", cls.alias("classification")
    )

    # Pass 2: detail extraction keyed by the (unique) classification value —
    # cheap string equality instead of re-running the prefix+regex chain,
    # so each row evaluates at most one extraction regex per column.
    # (CollapseProject will not inline the expensive class chain into the
    # ~100 references below: aliases referenced more than once by
    # non-trivial expressions are kept materialized.)
    num: Column = F.lit(None).cast("double")
    txt: Column = F.lit(None).cast("string")
    for r in reversed(RULES):
        m = F.col("classification") == r.classification
        if r.num_group:
            num = F.when(
                m, F.regexp_extract(F.col("content"), r.regex, r.num_group).cast("double")
            ).otherwise(num)
        if r.text_group:
            txt = F.when(
                m, F.regexp_extract(F.col("content"), r.regex, r.text_group)
            ).otherwise(txt)

    return classified.select(
        "pid",
        "seq",
        "log_level",
        "classification",
        num.alias("detail_num"),
        txt.alias("detail_text"),
    )


def classify_q(spark: SparkSession) -> DataFrame:
    return classify(spark).orderBy("pid", "seq")


def _sql_quote(s: str) -> str:
    return s.replace("'", "''")


def oracle_classify(stitched_cte: str) -> str:
    levels = ", ".join(f"'{lv}'" for lv in PRIMARY_LEVELS)

    def match(r: Rule) -> str:
        p = _sql_quote(r.prefix)
        rx = _sql_quote(r.regex)
        return (
            f"starts_with(content, '{p}') AND regexp_matches(content, '{rx}')"
        )

    cls = "CASE " + " ".join(
        f"WHEN {match(r)} THEN '{r.classification}'" for r in RULES
    ) + " ELSE 'UNCLASSIFIED' END"
    num = "CASE " + " ".join(
        (
            f"WHEN {match(r)} THEN "
            + (
                f"CAST(regexp_extract(content, '{_sql_quote(r.regex)}', {r.num_group}) AS DOUBLE)"
                if r.num_group
                else "CAST(NULL AS DOUBLE)"
            )
        )
        for r in RULES
    ) + " ELSE CAST(NULL AS DOUBLE) END"
    txt = "CASE " + " ".join(
        (
            f"WHEN {match(r)} THEN "
            + (
                f"regexp_extract(content, '{_sql_quote(r.regex)}', {r.text_group})"
                if r.text_group
                else "CAST(NULL AS VARCHAR)"
            )
        )
        for r in RULES
    ) + " ELSE CAST(NULL AS VARCHAR) END"

    return f"""
WITH stitched AS ({stitched_cte})
SELECT pid, seq, log_level,
  {cls} AS classification,
  {num} AS detail_num,
  {txt} AS detail_text
FROM stitched
WHERE log_level IN ({levels})
ORDER BY pid, seq
"""
