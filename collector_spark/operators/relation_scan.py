"""S10/S11 — the relation/index statistics megascan.

Reference: input/postgres/relation_stats.go:14-149 (relationStatsSQL), the
most complex relational program in the collector:

  locked_relids            -> filter + distinct over the pg_locks scan
  locked_relids_with_parents -> pg_inherits parent resolution, UNION dedup
                              (§2.6d)
  primary_objects          -> relkind/persistence filters, NOT IN locked
                              (left_anti), NOT IN extension objects (P4,
                              left_anti), ignore-regexp filter (P2)
  filtered_partitions      -> sizes of ignore-filtered child partitions
                              re-added to their collected parent
  lateral index aggregate  -> groupBy(indrelid) then left join (J5 shape)
  final projection          -> COALESCE defaults, xid-age CASEs
  UNION ALL placeholders   -> zeroed rows for locked relations via
                              unionByName (§2.6c), exclusively_locked=true

S11 (relation_stats.go:151-177, :258-298) is the per-index variant of the
same program.

Scale: locks/depend/inherits are tiny dimension sets — broadcast anti/equi
joins, no shuffle of the class side; the index aggregate is the one real
shuffle (pre-aggregation before join keeps it partial-aggregatable). The
placeholder union is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ignore-schema regexp ($1 in relationStatsSQL); even-numbered rels ignored
IGNORE = "^public[.]rel_[0-9]*[02468]$"

# synthetic "current xid" anchors for age arithmetic (age() = current - frozen);
# both exceed the fixture's modulus so ages stay positive
XID_EPOCH = 200_000
MXID_EPOCH = 100_000

STAT_COLS = [
    "seq_scan",
    "seq_tup_read",
    "n_tup_ins",
    "n_tup_upd",
    "n_tup_del",
    "n_live_tup",
    "n_dead_tup",
    "heap_blks_read",
    "heap_blks_hit",
]


def _locked_with_parents(spark: SparkSession) -> DataFrame:
    """locked_relids_with_parents CTE: AccessExclusiveLock'd relids plus
    their pg_inherits parents, UNION-deduped."""
    locked = (
        spark.table("lock_rows")
        .filter(
            (F.col("mode") == "AccessExclusiveLock")
            & (F.col("locktype") == "relation")
            & F.col("relation_oid").isNotNull()
        )
        .select(F.col("relation_oid").alias("relid"))
        .distinct()
    )
    inherits = spark.table("class_rows").filter(F.col("parent_oid").isNotNull())
    parents = (
        inherits.join(locked, inherits["oid"] == locked["relid"])
        .select(F.col("parent_oid").alias("relid"))
    )
    return parents.union(locked).distinct()


def _primary_objects(spark: SparkSession, locked_wp: DataFrame) -> DataFrame:
    cls = spark.table("class_rows")
    qualified = F.concat_ws(".", F.col("nspname"), F.col("relname"))
    ext_objs = (
        spark.table("depend_rows")
        .filter(F.col("deptype") == "e")
        .select(F.col("objid").alias("oid"))
        .distinct()
    )
    return (
        cls.filter(
            F.col("relkind").isin("r", "v", "m", "p")
            & (F.col("relpersistence") != "t")
            & ~qualified.rlike(IGNORE)
        )
        .join(locked_wp.withColumnRenamed("relid", "oid"), on="oid", how="left_anti")
        .join(ext_objs, on="oid", how="left_anti")
    )


def relation_scan(spark: SparkSession) -> DataFrame:
    """S10: full relation statistics with locked placeholders."""
    locked_wp = _locked_with_parents(spark)
    primary = _primary_objects(spark, locked_wp)
    cls = spark.table("class_rows")
    qualified = F.concat_ws(".", F.col("nspname"), F.col("relname"))

    # filtered_partitions: ignore-filtered child table partitions whose
    # parent IS collected — their size re-added to the parent
    fp = (
        cls.filter(
            F.col("parent_oid").isNotNull()
            & F.col("relkind").isin("r", "p")
            & qualified.rlike(IGNORE)
        )
        .join(
            primary.select(F.col("oid").alias("parent_oid")),
            on="parent_oid",
            how="inner",
        )
        .groupBy("parent_oid")
        .agg(F.sum("table_size_bytes").cast("long").alias("missed_bytes"))
    )

    # lateral index aggregate -> pre-aggregate then join
    idx = (
        spark.table("index_rows")
        .groupBy("indrelid")
        .agg(
            F.sum("idx_scan").cast("long").alias("i_scan"),
            F.sum("idx_tup_fetch").cast("long").alias("i_tup_fetch"),
            F.sum("idx_blks_read").cast("long").alias("i_blks_read"),
            F.sum("idx_blks_hit").cast("long").alias("i_blks_hit"),
        )
    )

    snap = spark.table("relation_snap2").select(
        F.col("relation_oid").alias("oid"),
        F.col("idx_tup_fetch").alias("s_idx_tup_fetch"),
        *[F.col(c).alias(f"s_{c}") for c in STAT_COLS],
    )

    joined = (
        primary.join(fp.withColumnRenamed("parent_oid", "oid"), on="oid", how="left")
        .join(snap, on="oid", how="left")
        .join(idx.withColumnRenamed("indrelid", "oid"), on="oid", how="left")
    )

    live = joined.select(
        F.col("oid"),
        (
            F.coalesce(F.col("table_size_bytes"), F.lit(0))
            + F.coalesce(F.col("missed_bytes"), F.lit(0))
        ).cast("long").alias("size_bytes"),
        *[
            F.coalesce(F.col(f"s_{c}"), F.lit(0)).cast("long").alias(c)
            for c in STAT_COLS
        ],
        F.coalesce(F.col("i_scan"), F.lit(0)).cast("long").alias("idx_scan"),
        # reference keeps COALESCE(i.idx_tup_fetch + tuples_fetched, 0):
        # a missing index aggregate nulls the whole sum -> 0
        F.coalesce(F.col("i_tup_fetch") + F.col("s_idx_tup_fetch"), F.lit(0))
        .cast("long")
        .alias("idx_tup_fetch"),
        F.coalesce(F.col("i_blks_read"), F.lit(0)).cast("long").alias("idx_blks_read"),
        F.coalesce(F.col("i_blks_hit"), F.lit(0)).cast("long").alias("idx_blks_hit"),
        F.when(F.col("frozenxid") != 0, F.lit(XID_EPOCH) - F.col("frozenxid"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("relation_xid_age"),
        F.when(F.col("minmxid") != 0, F.lit(MXID_EPOCH) - F.col("minmxid"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("relation_mxid_age"),
        F.col("relpages"),
        F.col("reltuples"),
        F.col("relallvisible"),
        F.lit(False).alias("exclusively_locked"),
    )

    zero_cols = (
        ["size_bytes"]
        + STAT_COLS
        + [
            "idx_scan",
            "idx_tup_fetch",
            "idx_blks_read",
            "idx_blks_hit",
            "relation_xid_age",
            "relation_mxid_age",
            "relpages",
            "reltuples",
            "relallvisible",
        ]
    )
    placeholders = locked_wp.select(
        F.col("relid").alias("oid"),
        *[F.lit(0).cast("long").alias(c) for c in zero_cols],
        F.lit(True).alias("exclusively_locked"),
    )
    return live.unionByName(placeholders, allowMissingColumns=False).orderBy("oid")


def oracle_relation_scan() -> str:
    stat_sel = ", ".join(f"COALESCE(s.{c}, 0) AS {c}" for c in STAT_COLS)
    zero_sel = ", ".join(
        f"CAST(0 AS BIGINT) AS {c}"
        for c in ["size_bytes"]
        + STAT_COLS
        + [
            "idx_scan",
            "idx_tup_fetch",
            "idx_blks_read",
            "idx_blks_hit",
            "relation_xid_age",
            "relation_mxid_age",
            "relpages",
            "reltuples",
            "relallvisible",
        ]
    )
    return f"""
WITH locked AS (
  SELECT DISTINCT relation_oid AS relid FROM lock_rows
  WHERE mode = 'AccessExclusiveLock' AND locktype = 'relation' AND relation_oid IS NOT NULL
),
locked_wp AS (
  SELECT DISTINCT parent_oid AS relid FROM class_rows
  WHERE parent_oid IS NOT NULL AND oid IN (SELECT relid FROM locked)
  UNION SELECT relid FROM locked
),
primary_objects AS (
  SELECT c.* FROM class_rows c
  WHERE c.relkind IN ('r','v','m','p') AND c.relpersistence <> 't'
    AND NOT regexp_matches(c.nspname || '.' || c.relname, '{IGNORE}')
    AND c.oid NOT IN (SELECT relid FROM locked_wp)
    AND c.oid NOT IN (SELECT objid FROM depend_rows WHERE deptype = 'e')
),
fp AS (
  SELECT t.parent_oid, CAST(SUM(t.table_size_bytes) AS BIGINT) AS missed_bytes
  FROM class_rows t
  JOIN primary_objects p ON p.oid = t.parent_oid
  WHERE t.parent_oid IS NOT NULL AND t.relkind IN ('r','p')
    AND regexp_matches(t.nspname || '.' || t.relname, '{IGNORE}')
  GROUP BY t.parent_oid
),
idx AS (
  SELECT indrelid,
    CAST(SUM(idx_scan) AS BIGINT) AS i_scan,
    CAST(SUM(idx_tup_fetch) AS BIGINT) AS i_tup_fetch,
    CAST(SUM(idx_blks_read) AS BIGINT) AS i_blks_read,
    CAST(SUM(idx_blks_hit) AS BIGINT) AS i_blks_hit
  FROM index_rows GROUP BY indrelid
)
SELECT c.oid,
  CAST(COALESCE(c.table_size_bytes, 0) + COALESCE(f.missed_bytes, 0) AS BIGINT) AS size_bytes,
  {stat_sel},
  COALESCE(i.i_scan, 0) AS idx_scan,
  CAST(COALESCE(i.i_tup_fetch + s.idx_tup_fetch, 0) AS BIGINT) AS idx_tup_fetch,
  COALESCE(i.i_blks_read, 0) AS idx_blks_read,
  COALESCE(i.i_blks_hit, 0) AS idx_blks_hit,
  CAST(CASE WHEN c.frozenxid <> 0 THEN {XID_EPOCH} - c.frozenxid ELSE 0 END AS BIGINT) AS relation_xid_age,
  CAST(CASE WHEN c.minmxid <> 0 THEN {MXID_EPOCH} - c.minmxid ELSE 0 END AS BIGINT) AS relation_mxid_age,
  c.relpages, c.reltuples, c.relallvisible,
  false AS exclusively_locked
FROM primary_objects c
LEFT JOIN fp f ON f.parent_oid = c.oid
LEFT JOIN relation_snap2 s ON s.relation_oid = c.oid
LEFT JOIN idx i ON i.indrelid = c.oid
UNION ALL
SELECT relid AS oid, {zero_sel}, true AS exclusively_locked
FROM locked_wp
ORDER BY oid
"""


def _locked_relids(spark: SparkSession) -> DataFrame:
    """Plain locked_relids CTE (no parent expansion) — the set indexStatsSQL
    uses, unlike the relation scan's locked_relids_with_parents."""
    return (
        spark.table("lock_rows")
        .filter(
            (F.col("mode") == "AccessExclusiveLock")
            & (F.col("locktype") == "relation")
            & F.col("relation_oid").isNotNull()
        )
        .select(F.col("relation_oid").alias("relid"))
        .distinct()
    )


def index_scan(spark: SparkSession) -> DataFrame:
    """S11: per-index stats with locked placeholders (relation_stats.go:
    151-177).

    Matches the reference's indexStatsSQL exactly: live rows filter on the
    index's OWN oid against the plain locked set (``s.indexrelid NOT IN
    locked_relids`` — no parent expansion, unlike S10), and ONE zeroed
    placeholder row is emitted per locked relid (indexrelid := relid) even
    when that oid is a table, with the non-oid columns zero-filled the way
    the reference's literal-0 SELECT does (index_name has no reference
    counterpart and stays NULL)."""
    locked = _locked_relids(spark)
    idx = spark.table("index_rows")
    live = idx.join(
        locked.withColumnRenamed("relid", "index_oid"), on="index_oid", how="left_anti"
    ).select(
        "index_oid",
        "indrelid",
        "index_name",
        "index_size_bytes",
        "idx_scan",
        "idx_tup_fetch",
        "idx_blks_read",
        "idx_blks_hit",
        F.lit(False).alias("exclusively_locked"),
    )
    placeholders = locked.select(
        F.col("relid").alias("index_oid"),
        F.lit(0).cast("long").alias("indrelid"),
        F.lit(None).cast("string").alias("index_name"),
        *[F.lit(0).cast("long").alias(c) for c in [
            "index_size_bytes", "idx_scan", "idx_tup_fetch", "idx_blks_read", "idx_blks_hit"
        ]],
        F.lit(True).alias("exclusively_locked"),
    )
    return live.unionByName(placeholders).orderBy("index_oid", "exclusively_locked")


def oracle_index_scan() -> str:
    zeros = ", ".join(
        f"CAST(0 AS BIGINT) AS {c}"
        for c in ["index_size_bytes", "idx_scan", "idx_tup_fetch", "idx_blks_read", "idx_blks_hit"]
    )
    return f"""
WITH locked AS (
  SELECT DISTINCT relation_oid AS relid FROM lock_rows
  WHERE mode = 'AccessExclusiveLock' AND locktype = 'relation' AND relation_oid IS NOT NULL
)
SELECT index_oid, indrelid, index_name, index_size_bytes, idx_scan, idx_tup_fetch,
       idx_blks_read, idx_blks_hit, false AS exclusively_locked
FROM index_rows WHERE index_oid NOT IN (SELECT relid FROM locked)
UNION ALL
SELECT relid AS index_oid, CAST(0 AS BIGINT) AS indrelid, CAST(NULL AS VARCHAR) AS index_name,
       {zeros}, true AS exclusively_locked
FROM locked
ORDER BY index_oid, exclusively_locked
"""
