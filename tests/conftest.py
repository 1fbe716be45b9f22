import os

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
# The full suite accumulates caches across ~600 tests; 4g (the library
# default) OOM-flaked the late stress legs — pin the proven 8g heap here,
# where the flakes were observed, instead of forcing it on every consumer.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from collector_spark.session import get_spark

    s = get_spark("collector_spark_tests")
    yield s


@pytest.fixture(scope="session")
def prepared_spark(spark):
    from collector_spark import registry

    registry.load_all()
    registry.prepare(spark, SF_DIR)
    return spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()
