"""Relation-statistics operators (F3 fixtures).

  A3 relation stats diff: counters subtracted, gauges (sizes, live/dead
     tuples) pass through (state/postgres_relation_stats.go:60-152)
  P5 locked-relation placeholder: AccessExclusiveLock'd relations get zeroed
     counter rows instead of stats (input/postgres/relation_stats.go:15-21,
     :106-148)
  P1/P3 ignore filters: glob/regex drop by qualified name
     (input/full.go:200-216)
  J5 lateral per-parent rollup: child partition sizes re-added to the parent
     (input/postgres/relation_stats.go:38-49,94-105) — groupBy-then-join, no
     lateral needed.

Scale: relation_meta is a dimension (5000 relations/server cap in the
reference) — always broadcast. The diff join shuffles by relation_oid once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collector_spark.core.diff import diff_counters, oracle_diff_sql

KEYS = ["relation_oid"]
COUNTERS = [
    "seq_scan",
    "seq_tup_read",
    "idx_scan",
    "idx_tup_fetch",
    "n_tup_ins",
    "n_tup_upd",
    "n_tup_del",
    "heap_blks_read",
    "heap_blks_hit",
    "idx_blks_read",
    "idx_blks_hit",
]
GAUGES = ["size_bytes", "n_live_tup", "n_dead_tup"]


def relation_diff(spark: SparkSession) -> DataFrame:
    """A3 + P5: diffed stats, with locked relations zeroed to placeholders."""
    d = diff_counters(
        spark.table("relation_snap2"),
        spark.table("relation_snap1"),
        KEYS,
        COUNTERS,
        gauges=GAUGES,
    )
    meta = spark.table("relation_meta").select(
        "relation_oid", "schema_name", "table_name", "exclusively_locked"
    )
    j = d.join(F.broadcast(meta), on="relation_oid", how="inner")
    locked = F.col("exclusively_locked")
    cols = [F.col("relation_oid"), F.col("schema_name"), F.col("table_name")]
    for c in COUNTERS + GAUGES:
        cols.append(F.when(locked, F.lit(0)).otherwise(F.col(c)).alias(c))
    cols.append(locked.alias("exclusively_locked"))
    return j.select(*cols).orderBy("relation_oid")


def oracle_relation_diff() -> str:
    inner = oracle_diff_sql("relation_snap2", "relation_snap1", KEYS, COUNTERS, gauges=GAUGES)
    zeroed = ", ".join(
        f"CASE WHEN m.exclusively_locked THEN 0 ELSE d.{c} END AS {c}"
        for c in COUNTERS + GAUGES
    )
    return f"""
SELECT d.relation_oid, m.schema_name, m.table_name, {zeroed}, m.exclusively_locked
FROM ({inner}) d
JOIN relation_meta m USING (relation_oid)
ORDER BY d.relation_oid
"""


def ignore_filter(spark: SparkSession) -> DataFrame:
    """P1/P3: drop relations whose qualified name matches the ignore list.

    The reference translates comma-separated globs to anchored regexes; the
    fixture pattern ignores 'public.rel_1*' (input/full.go:200-216).
    """
    meta = spark.table("relation_meta")
    qualified = F.concat_ws(".", F.col("schema_name"), F.col("table_name"))
    return (
        meta.withColumn("qualified_name", qualified)
        .filter(~qualified.rlike("^public\\.rel_1[0-9]*$"))
        .select("relation_oid", "qualified_name", "relation_type")
        .orderBy("relation_oid")
    )


def oracle_ignore_filter() -> str:
    return """
SELECT relation_oid, schema_name || '.' || table_name AS qualified_name, relation_type
FROM relation_meta
WHERE NOT regexp_matches(schema_name || '.' || table_name, '^public\\.rel_1[0-9]*$')
ORDER BY relation_oid
"""


def parent_size_rollup(spark: SparkSession) -> DataFrame:
    """J5-style pre-aggregate-then-join: child partition sizes summed into
    the parent (relation_stats.go:38-49). Children are rels with parent_relid
    set; output one row per parent with own + children bytes."""
    meta = spark.table("relation_meta").select("relation_oid", "parent_relid")
    sizes = spark.table("relation_snap2").select("relation_oid", "size_bytes")
    child_sum = (
        meta.filter(F.col("parent_relid").isNotNull())
        .join(sizes, on="relation_oid", how="inner")
        .groupBy(F.col("parent_relid").alias("relation_oid"))
        .agg(F.sum("size_bytes").cast("long").alias("children_bytes"))
    )
    parents = meta.filter(F.col("parent_relid").isNull()).select("relation_oid")
    out = (
        parents.join(sizes, on="relation_oid", how="left")
        .join(child_sum, on="relation_oid", how="left")
        .select(
            "relation_oid",
            F.coalesce(F.col("size_bytes"), F.lit(0)).alias("own_bytes"),
            F.coalesce(F.col("children_bytes"), F.lit(0)).alias("children_bytes"),
            (
                F.coalesce(F.col("size_bytes"), F.lit(0))
                + F.coalesce(F.col("children_bytes"), F.lit(0))
            ).alias("total_bytes"),
        )
    )
    return out.orderBy("relation_oid")


def oracle_parent_size_rollup() -> str:
    return """
WITH child_sum AS (
  SELECT m.parent_relid AS relation_oid, CAST(SUM(s.size_bytes) AS BIGINT) AS children_bytes
  FROM relation_meta m JOIN relation_snap2 s USING (relation_oid)
  WHERE m.parent_relid IS NOT NULL GROUP BY m.parent_relid
)
SELECT p.relation_oid,
  COALESCE(s.size_bytes, 0) AS own_bytes,
  COALESCE(c.children_bytes, 0) AS children_bytes,
  COALESCE(s.size_bytes, 0) + COALESCE(c.children_bytes, 0) AS total_bytes
FROM (SELECT relation_oid FROM relation_meta WHERE parent_relid IS NULL) p
LEFT JOIN relation_snap2 s USING (relation_oid)
LEFT JOIN child_sum c USING (relation_oid)
ORDER BY p.relation_oid
"""
