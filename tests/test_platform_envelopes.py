"""Semantic pins for the round-6 platform envelopes, modeled on the
reference's own test coverage (planetscale/logs_test.go, tembo jsonlog
mapping, supabase ParsedFields, neon LogDatabaseFallback) — behaviors the
oracle gate can't distinguish from a matching-but-wrong pair."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_planetscale_filters_and_parse_skip(prepared_spark):
    from collector_spark.logs.transport import planetscale_items

    raw = prepared_spark.table("planetscale_entries")
    items = planetscale_items(prepared_spark).persist()
    try:
        n_raw = raw.count()
        n_items = items.count()
        # malformed + vtgate + replica entries are dropped, plenty remain
        assert 0 < n_items < n_raw
        # decode errors skip-and-continue: garbage payloads never surface
        assert items.filter(F.col("content").startswith("garbage")).count() == 0
        # every surviving entry parsed a timestamp (RFC3339 in all three
        # fixture variants: Z, fractional, numeric offset)
        assert items.filter(F.col("occurred_at").isNull()).count() == 0
    finally:
        items.unpersist()


def test_planetscale_plan_trailing_cap_and_resume(prepared_spark):
    from collector_spark.logs.transport import (
        PS_MAX_KEEP_BYTES,
        planetscale_tail_plan,
    )

    rows = {r["branch_id"]: r for r in planetscale_tail_plan(prepared_spark).collect()}
    assert set(rows) == {"br0", "br1"}
    # br0 resumes from its since marker, so it fetches strictly fewer
    # entries than the stateless br1 (logs_test.go PaginationWithSince)
    assert rows["br0"]["entries"] < rows["br1"]["entries"]
    for r in rows.values():
        assert r["bytes_kept"] <= PS_MAX_KEEP_BYTES
        if r["truncated"]:
            # the boundary entry is clipped exactly to the cap
            # (logs_test.go SizeLimitDiscardsOlderData)
            assert r["bytes_kept"] == PS_MAX_KEEP_BYTES
            assert r["bytes_downloaded"] > PS_MAX_KEEP_BYTES
        assert r["last_timestamp"] is not None


def test_tembo_detail_twin_and_escaping_roundtrip(prepared_spark):
    from collector_spark.logs.transport import tembo_items

    items = tembo_items(prepared_spark).persist()
    try:
        mains = items.filter(F.col("line_idx") == 0)
        details = items.filter(F.col("line_idx") == 1)
        # every message frame carries 2 values; detail only on the %4
        # subset of first records
        assert mains.count() > 0 and 0 < details.count() < mains.count()
        assert details.filter(F.col("log_level") != "DETAIL").count() == 0
        # the nested-JSON escaping round-trips: message text contains the
        # expected un-escaped content, no stray backslashes
        assert mains.filter(F.col("content").contains('\\"')).count() == 0
        assert (
            mains.filter(F.col("content") == "checkpoint starting: time").count()
            > 0
        )
        # jsonlog numeric fields decode (tembo/logs.go:193-200)
        assert mains.filter(F.col("backend_pid").isNull()).count() == 0
    finally:
        items.unpersist()


def test_supabase_skips_supavisor_records(prepared_spark):
    from collector_spark.logs.transport import supabase_items

    raw = prepared_spark.table("supabase_drain_records")
    items = supabase_items(prepared_spark)
    n_pooler = raw.filter(F.col("payload").contains("supavisor")).count()
    assert n_pooler > 0
    # exactly the records carrying metadata.parsed survive
    assert items.count() == raw.count() - n_pooler


def test_neon_fallback_scope(prepared_spark):
    from collector_spark.logs.transport import neon_items

    items = neon_items(prepared_spark).persist()
    try:
        missing = items.filter(F.col("database").isNull())
        servers = {
            r["server_id"]: r["system_type"]
            for r in prepared_spark.table("neon_servers").collect()
        }
        for r in missing.collect():
            if servers[r["server_id"]] == "neon":
                assert r["resolved_database"] == f"maindb_{r['server_id']}"
            else:
                assert r["resolved_database"] is None
        # parsed databases always win over the fallback
        assert (
            items.filter(
                F.col("database").isNotNull()
                & (F.col("database") != F.col("resolved_database"))
            ).count()
            == 0
        )
    finally:
        items.unpersist()


def test_query_run_routes_and_cleanup(prepared_spark):
    from collector_spark.operators.query_run import query_run_workflow

    out = query_run_workflow(prepared_spark).persist()
    try:
        routes = {r["route"] for r in out.select("route").distinct().collect()}
        assert routes == {
            "skipped_finished",
            "failed_type",
            "failed_connect",
            "failed_helper",
            "ran",
        }
        # pid/marker/result only on the ran path (query_run.go:95-117)
        assert (
            out.filter(
                (F.col("route") != "ran")
                & (
                    F.col("backend_pid").isNotNull()
                    | F.col("marker").isNotNull()
                    | F.col("result").isNotNull()
                )
            ).count()
            == 0
        )
        assert (
            out.filter(
                (F.col("route") == "ran")
                & ~F.col("marker").contains("pganalyze-query-run:")
            ).count()
            == 0
        )
        # the 10-minute TTL drops some finished runs but not all
        kept = out.filter("retained").count()
        assert 0 < kept < out.count()
    finally:
        out.unpersist()


def test_explain_analyze_guard_goldens(prepared_spark):
    """validateQuery branch goldens: every reference error string surfaces
    on its statement family (explain_analyze.go:61-117), wCTE SELECTs are
    permitted, and the timeout ladder counts explain calls correctly."""
    from collector_spark.operators.query_run import explain_analyze_guard

    out = {r["query_text"]: r for r in explain_analyze_guard(prepared_spark).collect()}

    def one(prefix):
        matches = [r for t, r in out.items() if t.startswith(prefix)]
        assert matches, prefix
        return matches[0]

    assert one("WITH c AS")["valid"]
    assert one("INSERT ")["error"].endswith("DML statement")
    assert one("UPDATE ")["error"].endswith("DML statement")
    assert one("VACUUM ")["error"].endswith("utility statement")
    assert one("SELECT 1; SELECT 2")["error"].endswith(
        "multi-statement query string"
    )
    assert one("SELEC 1")["error"].endswith("failed to parse")
    assert one("SELECT dblink(")["error"].endswith("function not allowed: dblink")
    # schema-qualified blocked call still refused by its name
    assert one("SELECT public.crosstab(")["error"].endswith(
        "function not allowed: crosstab"
    )
    assert one("SELECT xpath_table(")["error"].endswith(
        "function not allowed: xpath_table"
    )
    # ladder: invalid -> 0 calls; no timeout -> warm-up + final = 2;
    # timeout -> 3, double-timeout degrades to plain EXPLAIN
    for r in out.values():
        if not r["valid"]:
            assert r["explain_calls"] == 0 and r["final_flags"] is None
        elif r["degraded_to_plain_explain"]:
            assert r["explain_calls"] == 3 and r["final_flags"] == ""
        else:
            assert r["final_flags"] == "ANALYZE,BUFFERS"
            assert r["explain_calls"] in (2, 3)
