"""Scalable dense-index assignment for star-schema dimensions (J10).

Reference: output/transform/util.go:25-150 assigns each distinct dimension
member a dense int32 idx. A distributed engine can't use insertion order, so
the contract here is *global sorted rank* — deterministic and
order-insensitive (SURVEY.md §7.4 hard part 5).

The naive Spark spelling, ``row_number().over(Window.orderBy(keys))``, is a
single-partition exchange: every distinct key funnels through ONE task. Fine
for a dozen databases; a scale-killer for millions of query fingerprints.

``dense_index`` instead computes the same sorted rank as a two-level rank:

  1. range-partition the distinct keys (equal keys co-locate; partition i's
     keys all sort before partition i+1's);
  2. local ``row_number`` *within* each range partition — parallel;
  3. per-partition counts -> per-partition starting offsets via a tiny
     self-join over at most ``num_parts`` rows (no single-partition window,
     no driver collect, fully lazy);
  4. idx = offset + local rank - 1.

The result is identical to the global window for any partition boundaries —
PROVIDED the rank and count branches observe the *same* boundaries. Exchange
reuse usually guarantees that, but it is not a correctness primitive: with a
cached relation upstream (core/pinned.py) plus AQE, the two branches were
observed to re-sample different range boundaries, silently producing
duplicate/missing idx values. The range-partitioned keys are therefore
materialized once via ``localCheckpoint`` (JVM-side, small — dim keys only)
so both branches read one physical partitioning; consistency no longer
depends on plan-identity heuristics. The plan contains no
``Exchange SinglePartition`` (pinned by tests/test_dense_dim.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Partition count for the dimension key space. Dimension key sets are orders
# of magnitude smaller than facts, so parallelism-sized (not data-sized) is
# right; raise via the argument for a billion-fingerprint dim.
DEFAULT_DIM_PARTS = 32


def dense_index(
    df: DataFrame,
    key_cols: list[str],
    idx_name: str,
    num_parts: int = DEFAULT_DIM_PARTS,
) -> DataFrame:
    """Distinct ``key_cols`` of ``df`` with a dense int32 ``idx_name`` column
    equal to each key's 0-based global sorted rank."""
    keys = df.select(*key_cols).distinct()
    # NULLS LAST explicitly: Spark's default ascending order is nulls-first
    # while DuckDB's row_number ORDER BY (every oracle) is nulls-last; a
    # nullable dim key would silently rank differently without the pin.
    order = [F.col(c).asc_nulls_last() for c in key_cols]
    # materialized once: both consumers below MUST see the same (_pid, key)
    # assignment; see module docstring. Dim key sets are O(distinct keys),
    # orders of magnitude smaller than facts, so the checkpoint is cheap and
    # its storage is reclaimed when the RDD is garbage-collected.
    ranged = (
        keys.repartitionByRange(num_parts, *order)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    local = ranged.withColumn(
        "_lrn",
        F.row_number()
        .over(Window.partitionBy("_pid").orderBy(*order))
        .cast("long"),
    )
    counts = ranged.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    # offset(p) = sum of counts of all partitions before p. counts has at
    # most num_parts rows, so the theta-join is O(num_parts^2) over a
    # broadcast-small relation — never a data-sized shuffle.
    offsets = (
        counts.alias("a")
        .join(
            F.broadcast(counts.alias("b")),
            F.col("b._pid") < F.col("a._pid"),
            "left",
        )
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_off"))
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(idx_name, (F.col("_off") + F.col("_lrn") - 1).cast("int"))
        .select(*key_cols, idx_name)
    )
