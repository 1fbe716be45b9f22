"""Snapshot sink: integrity verification + partitioned parquet round-trip."""

from __future__ import annotations

import os
import shutil
import tempfile


def test_write_snapshot_partitioned_roundtrip(prepared_spark):
    from collector_spark.operators.snapshot import (
        assemble_statement_fact,
        write_snapshot,
    )

    path = os.path.join(tempfile.mkdtemp(), "snap")
    try:
        write_snapshot(prepared_spark, path)
        # partitioned by database_oid
        parts = [d for d in os.listdir(path) if d.startswith("database_oid=")]
        assert len(parts) > 1
        back = prepared_spark.read.parquet(path)
        expected = assemble_statement_fact(prepared_spark)
        assert back.count() == expected.count()
        assert set(back.columns) == set(expected.columns)
    finally:
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def test_verify_integrity_catches_gaps(prepared_spark):
    import pytest
    from pyspark.sql import functions as F

    from collector_spark.operators.snapshot import (
        assemble_statement_fact,
        verify_integrity,
    )

    fact = assemble_statement_fact(prepared_spark)
    verify_integrity(fact)  # clean fact passes

    broken = fact.withColumn(
        "query_idx", F.col("query_idx") + F.lit(5)
    )  # non-dense idx space
    with pytest.raises(ValueError, match="non-dense"):
        verify_integrity(broken)
