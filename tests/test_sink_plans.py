"""Production-sink plan contract: registered queries carry a trailing
global orderBy only for oracle determinism; ``registry.sink_queries()``
must elide it (no all-data range exchange at the plan root) while keeping
the row multiset identical."""

from __future__ import annotations

from collector_spark import registry


def _root_is_global_sort(df) -> bool:
    # the ANALYZED root (not the optimized plan: under a warm session
    # Catalyst's EliminateSorts can drop a sort it proves redundant,
    # making the optimized shape cache-state-dependent)
    lp = df._jdf.queryExecution().analyzed()
    return lp.getClass().getSimpleName() == "Sort" and getattr(lp, "global")()


def _optimized_has_global_sort(df) -> bool:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: ").rstrip()
        if s.startswith("Sort [") and s.endswith(", true"):
            return True
    return False


SAMPLE = ["a1_statement_diff", "s10_relation_scan", "ml_doc_chunks"]


def test_sink_queries_drop_only_the_global_sort(prepared_spark):
    sf_dir = registry.active_dir(prepared_spark)
    ordered = registry.driver_queries()
    sink = registry.sink_queries()
    for name in SAMPLE:
        odf = ordered[name](prepared_spark, sf_dir)
        sdf = sink[name](prepared_spark, sf_dir)
        assert _root_is_global_sort(odf), f"{name}: expected ordered plan sort"
        assert not _root_is_global_sort(sdf), f"{name}: sink root still sorts"
        assert not _optimized_has_global_sort(sdf), f"{name}: sink plan sorts"
        assert sorted(map(tuple, sdf.collect())) == sorted(
            map(tuple, odf.collect())
        ), f"{name}: sink rows diverge"


def test_drop_trailing_sort_noop_without_sort(prepared_spark):
    df = prepared_spark.range(10)
    assert registry.drop_trailing_sort(df) is df
