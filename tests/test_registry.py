"""Registry hygiene: the catalog must load exactly once per query name —
a silent dict overwrite is how a stale query variant ships unnoticed
(r7 verdict item 4: ml_source_overlap was registered twice). An IDENTICAL
re-registration (module reload) must NOT raise — importlib.reload of the
catalog re-executes every register() call with the same definitions
(r8 advice: reload previously hit the duplicate guard)."""

import pytest


def test_duplicate_registration_raises():
    from collector_spark import registry

    registry.load_all()
    any_name = next(iter(registry.REGISTRY))
    q = registry.REGISTRY[any_name]
    # a DIFFERENT definition under an existing name is the stale-variant
    # hazard the guard exists for
    with pytest.raises(ValueError, match="duplicate query registration"):
        registry.register(any_name, q.spark_fn, "SELECT 1 AS different_oracle")


def test_identical_reregistration_is_reload_safe():
    from collector_spark import registry

    registry.load_all()
    any_name = next(iter(registry.REGISTRY))
    q = registry.REGISTRY[any_name]
    # same name + same oracle + same fixtures + same function identity =
    # a reload, not a duplicate — must replace cleanly
    registry.register(any_name, q.spark_fn, q.oracle, fixtures=list(q.fixtures))
    assert registry.REGISTRY[any_name].oracle == q.oracle


def test_catalog_reload_does_not_raise():
    import importlib
    import sys

    from collector_spark import registry

    registry.load_all()
    n = len(registry.REGISTRY)
    importlib.reload(sys.modules["collector_spark.queries_catalog"])
    assert len(registry.REGISTRY) == n


def test_catalog_loads_without_duplicates():
    # load_all() itself would raise if the catalog double-registered
    from collector_spark import registry

    registry.load_all()
    assert len(registry.REGISTRY) >= 201
