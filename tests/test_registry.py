"""Registry hygiene: the catalog must load exactly once per query name —
a silent dict overwrite is how a stale query variant ships unnoticed
(r7 verdict item 4: ml_source_overlap was registered twice)."""

import pytest


def test_duplicate_registration_raises():
    from collector_spark import registry

    registry.load_all()
    any_name = next(iter(registry.REGISTRY))
    q = registry.REGISTRY[any_name]
    with pytest.raises(ValueError, match="duplicate query registration"):
        registry.register(any_name, q.spark_fn, q.oracle)


def test_catalog_loads_without_duplicates():
    # load_all() itself would raise if the catalog double-registered
    from collector_spark import registry

    registry.load_all()
    assert len(registry.REGISTRY) >= 201
