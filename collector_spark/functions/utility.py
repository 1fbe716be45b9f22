"""Utility-statement analysis (U3 secret detection, U4 utility guard).

Reference: logs/analyze.go:2320-2335 marks credentials inside utility
statements (CREATE/ALTER ROLE ... PASSWORD '...') as secret spans;
input/postgres/explain.go:95-99 guards EXPLAIN behind an is-utility parse
check. The reference uses the PostgreSQL parser; this engine declares a
regex contract over leading keywords and the PASSWORD clause — internally
consistent and oracle-checked (same fallback note as U1/U2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

UTILITY_PREFIX = "^(CREATE|ALTER|DROP|GRANT|REVOKE|TRUNCATE|VACUUM|ANALYZE|COPY|SET) "
# no backslashes: dialect-identical in Java regex and RE2
PASSWORD_RE = "PASSWORD '[^']*'"


def utility_stmt_scan(spark: SparkSession) -> DataFrame:
    """U3+U4: classify utility statements and redact embedded credentials."""
    t = spark.table("utility_stmts")
    is_utility = F.col("query_text").rlike(UTILITY_PREFIX)
    has_secret = F.col("query_text").rlike(PASSWORD_RE)
    return t.select(
        "stmt_id",
        is_utility.alias("is_utility"),
        has_secret.alias("has_credential"),
        F.regexp_replace("query_text", PASSWORD_RE, "PASSWORD '[redacted]'").alias(
            "redacted_text"
        ),
    ).orderBy("stmt_id")


def oracle_utility_stmt_scan() -> str:
    pw = PASSWORD_RE.replace("'", "''")  # SQL string-literal escaping
    return f"""
SELECT stmt_id,
  regexp_matches(query_text, '{UTILITY_PREFIX}') AS is_utility,
  regexp_matches(query_text, '{pw}') AS has_credential,
  regexp_replace(query_text, '{pw}', 'PASSWORD ''[redacted]''', 'g') AS redacted_text
FROM utility_stmts ORDER BY stmt_id
"""
