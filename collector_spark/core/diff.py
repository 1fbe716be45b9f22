"""Counter-diff kernel — the engine's core incremental-computation primitive.

The reference recomputes every statistic as ``current - previous`` per key
each collection cycle (runner/diff.go:38-96, input/full_1min.go:67-87), with
three special cases this kernel encodes once (SURVEY.md §7.4 calls this the
correctness hot spot):

  * new key (no previous row)      -> delta = current        (diff.go:48-49)
  * counter reset (cur < prev on the designated reset column, ST7:
    input/postgres/statements.go:78-126) -> delta = current  (re-seeded baseline)
  * gauges (sizes, live/dead tuples) pass through untouched  (diff.go:62-74)

Spark shape: a single equi-join on the key columns. Both sides arrive
pre-aggregated by the same keys, so at scale this is one shuffle (or zero if
both snapshots are bucketed by key — see ``notes`` in docstring below). AQE
handles key skew (hot query_ids).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def diff_counters(
    cur: DataFrame,
    prev: DataFrame,
    keys: list[str],
    counters: list[str],
    gauges: list[str] | None = None,
    reset_col: str | None = None,
) -> DataFrame:
    """Per-key counter deltas of ``cur`` against ``prev``.

    Keys present only in ``prev`` are dropped (the reference iterates the
    new snapshot); keys present only in ``cur`` yield delta = cur. If
    ``reset_col`` is given and cur < prev there, ALL counters re-seed to the
    current value (statement-reset semantics, ST7).

    Scale note: co-partitioning both snapshots by ``keys`` (bucketed tables
    or a prior repartition reused across stages) turns this into a
    shuffle-free sort-merge join; at 100 TB that is the difference between
    one 2x-data shuffle per cycle and none.
    """
    gauges = gauges or []
    prev_sel = prev.select(keys + [F.col(c).alias(f"__prev_{c}") for c in counters])
    joined = cur.join(prev_sel, on=keys, how="left")

    is_new = F.col(f"__prev_{counters[0]}").isNull()
    if reset_col:
        take_cur = is_new | (F.col(reset_col) < F.col(f"__prev_{reset_col}"))
    else:
        take_cur = is_new

    def delta(c: str) -> Column:
        return F.when(take_cur, F.col(c)).otherwise(F.col(c) - F.col(f"__prev_{c}")).alias(c)

    return joined.select(
        *[F.col(k) for k in keys],
        *[delta(c) for c in counters],
        *[F.col(g) for g in gauges],
    )


def oracle_diff_sql(
    cur: str,
    prev: str,
    keys: list[str],
    counters: list[str],
    gauges: list[str] | None = None,
    reset_col: str | None = None,
    double_cols: set[str] | frozenset[str] = frozenset(),
) -> str:
    """DuckDB SQL equivalent of :func:`diff_counters` (generated from the
    same column lists so the two sides cannot drift)."""
    gauges = gauges or []
    first = counters[0]
    take_cur = f"p.{first} IS NULL"
    if reset_col:
        take_cur += f" OR c.{reset_col} < p.{reset_col}"

    cols = []
    for c in counters:
        expr = f"CASE WHEN {take_cur} THEN c.{c} ELSE c.{c} - p.{c} END"
        if c in double_cols:
            expr = f"CAST({expr} AS DOUBLE)"
        cols.append(f"{expr} AS {c}")
    for g in gauges:
        expr = f"CAST(c.{g} AS DOUBLE)" if g in double_cols else f"c.{g}"
        cols.append(f"{expr} AS {g}")
    key_cols = ", ".join(f"c.{k}" for k in keys)
    using = ", ".join(keys)
    return (
        f"SELECT {key_cols}, "
        + ", ".join(cols)
        + f" FROM {cur} c LEFT JOIN {prev} p USING ({using})"
    )
