"""Integrity checks for the full-snapshot star facts (output/full.go:26-33
analog): every dense idx space is 0-based, gap-free, and every
cross-reference idx points inside its dimension or is the explicit -1
sentinel. The oracle sweep proves Spark==DuckDB; these prove the idx
algebra itself."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _assert_dense(df, col):
    row = df.agg(
        F.min(col).alias("mn"),
        F.max(col).alias("mx"),
        F.count_distinct(col).alias("nd"),
    ).collect()[0]
    assert row["mn"] == 0, f"{col}: min {row['mn']} != 0"
    assert row["mx"] + 1 == row["nd"], f"{col}: non-dense ({row['mx']}+1 != {row['nd']})"


def test_relation_fact_idx_integrity(prepared_spark):
    from collector_spark.operators.snapshot_facts import snapshot_relation_fact

    fact = snapshot_relation_fact(prepared_spark)
    fact = fact.persist()
    try:
        _assert_dense(fact, "relation_idx")
        n = fact.agg(F.count_distinct("relation_idx")).collect()[0][0]
        # parent refs: -1 or a valid relation_idx; flag consistent
        bad = fact.filter(
            (F.col("parent_relation_idx") < -1)
            | (F.col("parent_relation_idx") >= n)
            | (F.col("has_parent_relation") != (F.col("parent_relation_idx") >= 0))
        ).count()
        assert bad == 0
        # locked rows carry a zeroed statistics vector (reference emits no
        # RelationStatistic for them)
        locked_bad = fact.filter(
            F.col("exclusively_locked")
            & ((F.col("size_bytes") != 0) | (F.col("cached_data_bytes") != 0))
        ).count()
        assert locked_bad == 0
    finally:
        fact.unpersist()


def test_index_fact_refs_relation_dim(prepared_spark):
    from collector_spark.operators.snapshot_facts import (
        snapshot_index_fact,
        snapshot_relation_fact,
    )

    rel = snapshot_relation_fact(prepared_spark)
    idx = snapshot_index_fact(prepared_spark).persist()
    try:
        _assert_dense(idx, "index_idx")
        n_rel = rel.agg(F.count_distinct("relation_idx")).collect()[0][0]
        bad = idx.filter(
            (F.col("relation_idx") < -1) | (F.col("relation_idx") >= n_rel)
        ).count()
        assert bad == 0
        # the two facts share ONE relation dim: every non-sentinel
        # relation_idx resolves to the owning oid in the relation fact
        joined = (
            idx.filter(F.col("relation_idx") >= 0)
            .join(
                rel.select("relation_idx", F.col("oid").alias("rel_oid")),
                on="relation_idx",
            )
            .filter(F.col("indrelid") != F.col("rel_oid"))
            .count()
        )
        assert joined == 0
    finally:
        idx.unpersist()


def test_system_fact_sections_dense(prepared_spark):
    from collector_spark.operators.snapshot_facts import snapshot_system_fact

    fact = snapshot_system_fact(prepared_spark).persist()
    try:
        sections = [r["section"] for r in fact.select("section").distinct().collect()]
        assert set(sections) == {"cpu", "network", "disk"}
        for s in sections:
            _assert_dense(fact.filter(F.col("section") == s), "ref_idx")
        # section-local stat vectors: non-null exactly inside their section
        assert fact.filter(
            (F.col("section") == "cpu") & F.col("user_pct").isNull()
        ).count() == 0
        assert fact.filter(
            (F.col("section") != "cpu") & F.col("user_pct").isNotNull()
        ).count() == 0
    finally:
        fact.unpersist()


def test_replication_fact_lag_defaults(prepared_spark):
    from collector_spark.operators.snapshot_facts import snapshot_replication_fact

    fact = snapshot_replication_fact(prepared_spark).persist()
    try:
        _assert_dense(fact, "standby_idx")
        # reference defaults invalid byte lags to -1, never NULL
        assert fact.filter(
            F.col("remote_byte_lag").isNull() | F.col("local_byte_lag").isNull()
        ).count() == 0
    finally:
        fact.unpersist()


def test_function_fact_stats_flag(prepared_spark):
    from collector_spark.operators.snapshot_facts import snapshot_function_fact

    fact = snapshot_function_fact(prepared_spark).persist()
    try:
        _assert_dense(fact, "function_idx")
        _assert_dense(fact, "database_idx")
        # has_stats <=> counters present (reference emits the statistic row
        # only when stats exist)
        bad = fact.filter(
            F.col("has_stats") != F.col("calls").isNotNull()
        ).count()
        assert bad == 0
    finally:
        fact.unpersist()


def test_write_full_snapshot_roundtrip(prepared_spark, tmp_path):
    """output/full.go analog end-to-end: every fact family verifies its
    dense idx space, lands as partitioned parquet, and reads back with the
    written row count."""
    from collector_spark.operators.snapshot_facts import write_full_snapshot

    counts = write_full_snapshot(prepared_spark, str(tmp_path / "snap"))
    assert set(counts) == {
        "statement_fact",
        "relation_fact",
        "index_fact",
        "system_fact",
        "backend_fact",
        "replication_fact",
        "function_fact",
        "database_fact",
        "custom_type_fact",
        "role_fact",
        "extension_fact",
        "relation_events",
        "column_type_link",
        "plan_fact",
        "backend_count_fact",
    }
    assert all(n > 0 for n in counts.values()), counts
    # partition pruning surface exists for the tenant-keyed facts
    import os

    stmt_dir = tmp_path / "snap" / "statement_fact"
    assert any(p.startswith("database_oid=") for p in os.listdir(stmt_dir))


def test_dense_assert_accepts_empty_fact(prepared_spark):
    """A legitimately empty fact (zero standbys, no custom types) is a
    normal snapshot state — the integrity gate must not abort the emit."""
    from collector_spark.operators.snapshot_facts import (
        _assert_dense_idx,
        _assert_idx_link,
    )

    empty = prepared_spark.range(0).select(F.col("id").cast("int").alias("idx"))
    _assert_dense_idx(empty, "idx")
    _assert_idx_link(empty, "idx")


def test_system_fact_full_sections(prepared_spark):
    from collector_spark.operators.snapshot_facts import snapshot_system_fact_full

    fact = snapshot_system_fact_full(prepared_spark).persist()
    try:
        sections = {r["section"] for r in fact.select("section").distinct().collect()}
        assert sections == {
            "cpu",
            "network",
            "disk",
            "memory",
            "scheduler",
            "disk_partition",
            "system_info",
        }
        for s in sections:
            _assert_dense(fact.filter(F.col("section") == s), "ref_idx")
        # partition -> disk idx links resolve inside the disk section
        n_disks = fact.filter(F.col("section") == "disk").count()
        bad = fact.filter(
            (F.col("section") == "disk_partition")
            & ((F.col("disk_idx") < 0) | (F.col("disk_idx") >= n_disks))
        ).count()
        assert bad == 0
        # system info resolves the data-directory and xlog partitions
        si = fact.filter(F.col("section") == "system_info").collect()[0]
        assert si["data_directory_partition_idx"] is not None
        assert si["xlog_partition_idx"] is not None
    finally:
        fact.unpersist()
