"""Scale contract proof: when both snapshots are bucketed by the diff key
(core/diff.py's documented layout upgrade), the diff join runs with ZERO
exchanges — the difference between one 2x-data shuffle per collection
cycle and none at 100 TB."""

from __future__ import annotations

import shutil

KEYS = ["database_oid", "user_oid", "query_id", "toplevel"]


def test_bucketed_snapshots_diff_without_shuffle(prepared_spark):
    from collector_spark.core.diff import diff_counters
    from collector_spark.operators.statements import COUNTERS

    spark = prepared_spark
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    tables = []
    try:
        for name, src in (("b_snap1", "stmt_snap1"), ("b_snap2", "stmt_snap2")):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            (
                spark.table(src)
                .write.bucketBy(8, *KEYS)
                .sortBy(*KEYS)
                .mode("overwrite")
                .saveAsTable(name)
            )
            tables.append(name)

        d = diff_counters(
            spark.table("b_snap2"),
            spark.table("b_snap1"),
            KEYS,
            COUNTERS,
            reset_col="calls",
        )
        plan = d._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        # and it still computes the right thing
        assert d.count() == spark.table("stmt_snap2").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        for name in tables:
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree("spark-warehouse", ignore_errors=True)
