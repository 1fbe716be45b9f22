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


def _offsets_of(counts: DataFrame) -> DataFrame:
    """offset(p) = sum of counts of all partitions before p. ``counts`` has
    at most num_parts rows, so the theta-join is O(num_parts^2) over a
    broadcast-small relation — never a data-sized shuffle."""
    return (
        counts.alias("a")
        .join(
            F.broadcast(counts.alias("b")),
            F.col("b._pid") < F.col("a._pid"),
            "left",
        )
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_off"))
    )


def ranked_rows(
    df: DataFrame,
    key_cols: list[str],
    idx_name: str,
    num_parts: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Append ``idx_name`` = each row's 0-based global sorted rank over
    ``key_cols`` to EVERY row of ``df`` — the full-relation twin of
    ``dense_index`` for relations whose key_cols are UNIQUE per row (a
    global line number over log lines, not a dimension domain).

    Because every key occurs exactly once, ``dense_index``'s
    distinct-keys pass computes the identity and the rank join-back
    reattaches each row to itself — both pure overhead (r12 optimization
    find: the distinct ran TWICE per call, once for the range
    partitioner's sample pass and once for the checkpoint, plus a full
    join-back exchange in the consuming fact). Here the ROWS themselves
    are range-partitioned once (same two-level rank: local row_number +
    per-partition offsets, so no single-partition funnel), materialized
    via ``localCheckpoint`` so the rank and count branches observe one
    physical partitioning (the same consistency argument as
    dense_index's docstring).

    Returns ``(ranged, ranked)``: ``ranged`` is the materialized
    range-partitioned relation WITHOUT the rank column — consumers that
    only need the rows (classification joins, association windows,
    dimension builds) read it instead of re-deriving the staged subtree —
    and ``ranked`` adds ``idx_name``. Value-identical to
    ``df.join(dense_index(df, key_cols, idx_name), key_cols)`` under the
    caller-owned uniqueness contract."""
    if num_parts is None:
        num_parts = df.sparkSession.sparkContext.defaultParallelism
    order = [F.col(c).asc_nulls_last() for c in key_cols]
    ranged = (
        df.repartitionByRange(num_parts, *order)
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
    rank = F.col("_off") + F.col("_lrn") - 1
    # int32 guard (r13 ADVICE fix): unlike dense_index — whose int32 spans
    # only DISTINCT dim keys — this ranks every input row, so past 2^31
    # rows the cast would silently wrap into negative/duplicate refs. The
    # guard is one row-local comparison; out-of-range raises instead.
    guarded = F.when(rank <= F.lit(2147483647), rank).otherwise(
        F.raise_error(F.lit("ranked_rows: rank exceeds int32 range"))
    )
    ranked = (
        local.join(F.broadcast(_offsets_of(counts)), "_pid")
        .withColumn(idx_name, guarded.cast("int"))
        .drop("_pid", "_lrn", "_off")
    )
    return ranged.drop("_pid"), ranked


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
    return (
        local.join(F.broadcast(_offsets_of(counts)), "_pid")
        .withColumn(idx_name, (F.col("_off") + F.col("_lrn") - 1).cast("int"))
        .select(*key_cols, idx_name)
    )
