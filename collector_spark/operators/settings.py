"""Settings scan (S23/W1): DISTINCT ON (name) dedup by source priority plus
primary_conninfo redaction (input/postgres/settings.go:17-31).

Postgres' ``DISTINCT ON .. ORDER BY`` becomes a row_number window; the
redaction (``regexp_replace(setting, '.', 'X', 'g')``) stays a built-in
expression. The window partitions by ``name`` — high cardinality, no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def settings_dedup(spark: SparkSession) -> DataFrame:
    # (priority, setting) is not a total order when a setting value repeats
    # under one name with different source/context; include every output
    # column in the ORDER BY so the surviving row is engine-independent.
    w = Window.partitionBy("name").orderBy("priority", "setting", "source", "context")
    return (
        spark.table("settings_rows")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "name",
            F.when(
                F.col("name") == "primary_conninfo",
                F.regexp_replace(F.col("setting"), ".", "X"),
            )
            .otherwise(F.col("setting"))
            .alias("setting"),
            "source",
            "context",
        )
        .orderBy("name")
    )


def oracle_settings_dedup() -> str:
    return """
SELECT name,
  CASE WHEN name = 'primary_conninfo' THEN regexp_replace(setting, '.', 'X', 'g')
       ELSE setting END AS setting,
  source, context
FROM settings_rows
QUALIFY row_number() OVER (PARTITION BY name ORDER BY priority, setting, source, context) = 1
ORDER BY name
"""
