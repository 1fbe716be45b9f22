"""Buffer-cache operators (S9 scan, J3/A11 matching with untracked remainder).

Reference: input/postgres/buffer_cache.go:28-33 — pg_buffercache GROUP BY
(reldatabase, relfilenode) -> count(*) * block_size; output/transform/
postgres_buffer_cache.go matches filenodes to known relations and sums the
leftovers into an "untracked bytes" remainder per database (the anti-join-sum
residual pattern, J3/A11).

Scale: the page scan pre-aggregates by (db, filenode) before anything else
(map-side combine over the raw pages); the relation filenode set is a
broadcast dimension, so the tracked/untracked split adds no extra shuffle
beyond the final per-db rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def buffercache_scan(spark: SparkSession) -> DataFrame:
    """S9: bytes per (database_oid, relfilenode)."""
    return (
        spark.table("buffercache_rows")
        .groupBy("database_oid", "relfilenode")
        .agg(F.sum("block_bytes").cast("long").alias("bytes"))
        .orderBy("database_oid", "relfilenode")
    )


def oracle_buffercache_scan() -> str:
    return """
SELECT database_oid, relfilenode, CAST(SUM(block_bytes) AS BIGINT) AS bytes
FROM buffercache_rows
GROUP BY database_oid, relfilenode
ORDER BY database_oid, relfilenode
"""


def buffercache_totals(spark: SparkSession) -> DataFrame:
    """A11/J3: per-db totals split into tracked (filenode matches a relation
    with storage) and untracked remainder."""
    per_node = (
        spark.table("buffercache_rows")
        .groupBy("database_oid", "relfilenode")
        .agg(F.sum("block_bytes").cast("long").alias("bytes"))
    )
    # relations with storage: tables/matviews/partitions (views & indexes in
    # class_rows don't own heap filenodes here)
    tracked = (
        spark.table("class_rows")
        .filter(F.col("relkind").isin("r", "m", "p"))
        .select(F.col("oid").alias("relfilenode"))
        .distinct()
        .withColumn("__tracked", F.lit(1))
    )
    j = per_node.join(F.broadcast(tracked), on="relfilenode", how="left")
    is_tracked = F.col("__tracked").isNotNull()
    return (
        j.groupBy("database_oid")
        .agg(
            F.sum("bytes").cast("long").alias("total_bytes"),
            F.sum(F.when(is_tracked, F.col("bytes")).otherwise(F.lit(0)))
            .cast("long")
            .alias("tracked_bytes"),
            F.sum(F.when(~is_tracked, F.col("bytes")).otherwise(F.lit(0)))
            .cast("long")
            .alias("untracked_bytes"),
        )
        .orderBy("database_oid")
    )


def oracle_buffercache_totals() -> str:
    return """
WITH per_node AS (
  SELECT database_oid, relfilenode, CAST(SUM(block_bytes) AS BIGINT) AS bytes
  FROM buffercache_rows GROUP BY database_oid, relfilenode
),
tracked AS (
  SELECT DISTINCT oid AS relfilenode FROM class_rows WHERE relkind IN ('r','m','p')
)
SELECT p.database_oid,
  CAST(SUM(p.bytes) AS BIGINT) AS total_bytes,
  CAST(SUM(CASE WHEN t.relfilenode IS NOT NULL THEN p.bytes ELSE 0 END) AS BIGINT) AS tracked_bytes,
  CAST(SUM(CASE WHEN t.relfilenode IS NULL THEN p.bytes ELSE 0 END) AS BIGINT) AS untracked_bytes
FROM per_node p LEFT JOIN tracked t USING (relfilenode)
GROUP BY p.database_oid
ORDER BY p.database_oid
"""
