"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``collector_spark``; this module only adapts the
registry to the driver's surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from collector_spark import registry  # noqa: E402

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query at sf0.001: the full statement pipeline end to end —
    snapshot diff (reset-aware) -> text join -> fingerprint roll-up ->
    star-schema fact with dense dimension idx."""
    from collector_spark.operators import snapshot

    registry.prepare(spark, "/root/testdata/sf0.001")
    return snapshot.assemble_statement_fact(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.driver_queries()


def oracle_sql() -> dict[str, str]:
    return registry.driver_oracle_sql()
