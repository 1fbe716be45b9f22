"""Input-keyed pinned relations: persist a derived relation once per
(session, prepared input dir, name) and reuse it across the multiple plan
branches that consume it.

Fixture/temp views are lazy derivations — every scan branch re-evaluates
the full derivation subtree. Operators whose shape is "one derived relation
feeds N dimension builds plus the fact join" (snapshot assembly,
activity assembly) pin that relation instead: one evaluation, N reads.

Bounded by design: pinned relations are rollups or per-connection facts —
O(distinct keys) or O(max_connections), never O(input rows) — and at most
one copy per name is retained; re-preparing a different input dir replaces
(unpersists) the old copy.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple[int, str], tuple[str, DataFrame]] = {}


def pinned(
    spark: SparkSession, name: str, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return the pinned relation `name`, building + persisting on first
    use for the currently-prepared input dir."""
    from collector_spark import registry

    input_key = registry.active_dir(spark)
    key = (id(spark), name)
    cached = _CACHE.get(key)
    if cached is not None:
        if cached[0] == input_key:
            return cached[1]
        cached[1].unpersist()
        del _CACHE[key]
    df = build().persist()
    _CACHE[key] = (input_key, df)
    return df
