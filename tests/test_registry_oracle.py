"""The driver-shaped gate: every registered query with an oracle must match
DuckDB exactly at the test scale factor."""

import pytest

from tests.oracle import assert_frames_match


def _registry():
    from collector_spark import registry

    registry.load_all()
    return registry.REGISTRY


def pytest_generate_tests(metafunc):
    if "query_name" in metafunc.fixturenames:
        metafunc.parametrize("query_name", sorted(_registry().keys()))


def test_query_matches_oracle(query_name, prepared_spark, duck):
    from collector_spark.fixtures.defs import oracle_query
    from collector_spark import registry

    q = registry.REGISTRY[query_name]
    sdf = q.spark_fn(prepared_spark)
    assert sdf.count() >= 0  # runs
    if q.oracle is None:
        assert sdf.count() > 0, f"{query_name}: rows-only check needs rows"
        pytest.skip(f"{query_name}: no oracle (rows-only check)")
    rel = duck.execute(oracle_query(q.oracle, q.fixtures))
    assert_frames_match(sdf, rel, context=query_name)
