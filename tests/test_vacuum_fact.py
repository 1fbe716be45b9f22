"""F28 CompactActivitySnapshot vacuum facts: TOAST resolution semantics,
ref sentinels, and the broadcast-only plan shape.

Reference: input/postgres/vacuum_progress.go:119-131 (post-scan toast
parent resolution), output/transform/activity.go:48-108 (dense refs with
-1 sentinels, phase enum).
"""

from pyspark.sql import functions as F

from collector_spark.operators.vacuum import snapshot_vacuum_fact, vacuum_progress


def test_toast_rows_resolve_to_parent(prepared_spark):
    s27 = vacuum_progress(prepared_spark)
    rows = s27.filter(F.col("toast")).collect()
    assert rows, "fixture must produce at least one resolved toast vacuum"
    for r in rows:
        # resolution rewrote the names to the parent relation_meta entry
        assert r.nspname == "public"
        assert r.relname.startswith("rel_")
    # resolution happens AFTER the ignore-regexp blanking and is never
    # re-blanked: a resolved parent name may match the ignore pattern
    # (vacuum_progress.go applies $1 in SQL, the Go loop after)
    unresolved = s27.filter(F.col("nspname") == "pg_toast").collect()
    for r in unresolved:
        assert not r.toast


def test_ref_sentinels(prepared_spark):
    fact = snapshot_vacuum_fact(prepared_spark).collect()
    assert any(r.role_idx == -1 for r in fact), "NULL-usename fixture branch"
    assert any(r.relation_idx == -1 for r in fact), "ignore-blanked relname"
    for r in fact:
        assert r.database_idx >= 0  # database ref always upserted
        assert 0 <= r.phase_code <= 6
    # dense refs: contiguous from 0
    roles = sorted({r.role_idx for r in fact if r.role_idx >= 0})
    assert roles == list(range(len(roles)))
    rels = sorted({r.relation_idx for r in fact if r.relation_idx >= 0})
    assert rels == list(range(len(rels)))


def test_plan_broadcasts_every_join(prepared_spark):
    plan = snapshot_vacuum_fact(prepared_spark)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Exchange SinglePartition" not in plan
