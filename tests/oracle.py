"""Driver-style comparison: Spark result vs DuckDB oracle.

Mirrors the driver's check: row count, column names, and order-insensitive
exact value comparison (columns sorted by name, rows sorted by all columns).
Exactness is the point — the engine's outputs are designed to be
bit-identical across engines (decimal-exact aggregation, shared fixture
SQL), so no tolerance is applied.
"""

from __future__ import annotations

import math
from decimal import Decimal

import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # normalize numpy scalar wrappers / Decimals to plain python
        df[c] = df[c].map(_canon_value)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return None
    if hasattr(v, "item"):  # numpy scalar
        v = v.item()
        if isinstance(v, float) and math.isnan(v):
            return None
    return v


def _assert_dtype_families(left: pd.DataFrame, right: pd.DataFrame, context: str) -> None:
    """Pandas-dtype-family check on the frames the driver actually hashes:
    a column that is integer-kind on one engine and float-kind on the other
    (e.g. a DuckDB window SUM -> HUGEINT -> pandas float64 vs Spark's
    int64) hashes differently in the driver's value-hash even when every
    value is numerically identical. The value comparison below coerces
    (float(a) == float(b)), so without this check such a skew passes
    locally and flakes only in the driver (the r7 ml_sequence_packing red
    row: oracle stream_offset/offset_in_pack came back float64)."""
    for c in left.columns:
        if c not in right.columns:
            continue  # column-set mismatch reported below
        lk, rk = left[c].dtype.kind, right[c].dtype.kind
        if ({lk, rk} <= {"i", "u", "f"}) and (("f" in (lk, rk)) != (lk == rk == "f")):
            raise AssertionError(
                f"{context}: col {c}: numeric dtype-family skew "
                f"spark={left[c].dtype} oracle={right[c].dtype} — driver "
                f"hash hazard; CAST the oracle (HUGEINT->BIGINT etc.) or "
                f"align the Spark type"
            )


def assert_frames_match(spark_df, duck_rel, context: str = "") -> None:
    left = spark_df.toPandas()
    right = duck_rel.fetchdf()
    _assert_dtype_families(left, right, context)
    left = _canon(left)
    right = _canon(right)
    assert list(left.columns) == list(right.columns), (
        f"{context}: column mismatch {list(left.columns)} vs {list(right.columns)}"
    )
    assert len(left) == len(right), f"{context}: row count {len(left)} vs {len(right)}"
    for c in left.columns:
        lv, rv = list(left[c]), list(right[c])
        for i, (a, b) in enumerate(zip(lv, rv)):
            assert _eq(a, b), f"{context}: col {c} row {i}: spark={a!r} oracle={b!r}"


def _eq(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        # covers pd.NaT (and other pandas missing scalars) on both sides
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    if isinstance(a, bool) or isinstance(b, bool):
        return bool(a) == bool(b)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    return a == b
