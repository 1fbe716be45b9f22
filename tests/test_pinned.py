"""Input-keyed pinned-relation cache (core/pinned.py): one build per
(session, input dir, name); re-preparing a different dir replaces —
unpersists — the old copy instead of stacking cached relations."""

from __future__ import annotations


def test_pinned_builds_once_and_invalidates_on_dir_change(prepared_spark):
    from collector_spark import registry
    from collector_spark.core.pinned import pinned

    spark = prepared_spark
    calls = []

    def build():
        calls.append(1)
        return spark.range(3)

    name = "pinned_test_rel"
    a = pinned(spark, name, build)
    b = pinned(spark, name, build)
    assert a is b
    assert len(calls) == 1

    # simulate an input-dir switch: the cache key changes, the old copy is
    # replaced and unpersisted, and the builder runs again
    old_dir = registry.active_dir(spark)
    try:
        registry._ACTIVE_DIR[id(spark)] = old_dir + "_other"
        c = pinned(spark, name, build)
        assert c is not a
        assert len(calls) == 2
        assert a.is_cached is False  # unpersisted
    finally:
        registry._ACTIVE_DIR[id(spark)] = old_dir
        pinned(spark, name, build)  # restore entry for the real dir
