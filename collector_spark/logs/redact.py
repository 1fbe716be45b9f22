"""U8 — secret redaction (logs/replace.go:13-42).

The reference marks secret spans during classification (statement_text,
parameter values) and splices '[redacted]' over them before upload. The
equivalent span set in this pipeline: quoted SQL literals inside STATEMENT
secondaries and DETAIL parameter lines. Pure regexp_replace — stays in
codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collector_spark.logs.associate import associate_secondaries

_SECRET_RE = r"'[^']*'"


def redact_secondaries(spark: SparkSession) -> DataFrame:
    sec = associate_secondaries(spark)
    needs = F.col("secondary_level").isin("STATEMENT", "DETAIL")
    return sec.select(
        "pid",
        "primary_seq",
        "secondary_seq",
        "secondary_level",
        F.when(
            needs,
            F.regexp_replace(F.col("secondary_content"), _SECRET_RE, "[redacted]"),
        )
        .otherwise(F.col("secondary_content"))
        .alias("redacted_content"),
    )


def redact_secondaries_q(spark: SparkSession) -> DataFrame:
    return redact_secondaries(spark).orderBy("pid", "secondary_seq")


def oracle_redact(associated_cte: str) -> str:
    rx = _SECRET_RE.replace("'", "''")
    return f"""
WITH assoc AS ({associated_cte})
SELECT pid, primary_seq, secondary_seq, secondary_level,
  CASE WHEN secondary_level IN ('STATEMENT', 'DETAIL')
       THEN regexp_replace(secondary_content, '{rx}', '[redacted]', 'g')
       ELSE secondary_content END AS redacted_content
FROM assoc
ORDER BY pid, secondary_seq
"""
