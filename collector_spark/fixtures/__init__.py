from collector_spark.fixtures.defs import (  # noqa: F401
    FIXTURES,
    fixture_cte,
    oracle_query,
    register_fixture_views,
)
