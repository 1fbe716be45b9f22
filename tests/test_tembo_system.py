"""Semantics pins for the Tembo system scan (input/system/tembo/system.go):
the empty Prometheus result vector defaults to 0 (system.go:139-147), and
the reference's DiskPartition quirk — TotalBytes is assigned the AVAILABLE
bytes, not the capacity (system.go:113-118) — is mirrored, not "fixed".
DuckDB-only: the Spark==oracle equivalence is the registry sweep's job."""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def tembo_rows():
    from collector_spark.fixtures.defs import oracle_query
    from collector_spark.operators.system import oracle_tembo_system_scan

    con = duckdb.connect()
    for t in ("orders", "region"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    sql = oracle_query(oracle_tembo_system_scan(), ["tembo_metric_responses"])
    cols = [d[0] for d in con.execute(sql).description]
    return [dict(zip(cols, r)) for r in con.execute(sql).fetchall()]


def test_empty_result_defaults_to_zero(tembo_rows):
    # the fixture renders an empty result vector for org-inst-5's
    # disk_available query: the reference parses that as 0, so
    # used = capacity - 0 and total = 0
    quirk = next(r for r in tembo_rows if r["namespace"] == "org-inst-5")
    assert quirk["data_directory_total_bytes"] == 0
    assert quirk["data_directory_used_bytes"] > 0


def test_total_bytes_is_available_not_capacity(tembo_rows):
    # the reference assigns TotalBytes = diskAvailable (system.go:117);
    # with the fixture's available = capacity/2, used == total for every
    # namespace whose queries all returned samples
    for r in tembo_rows:
        if r["namespace"] == "org-inst-5":
            continue
        assert r["data_directory_total_bytes"] == r["data_directory_used_bytes"]
        assert r["memory_free_bytes"] == r["memory_available_bytes"]


def test_every_namespace_present(tembo_rows):
    assert [r["namespace"] for r in tembo_rows] == [
        f"org-inst-{i}" for i in range(6)
    ]
