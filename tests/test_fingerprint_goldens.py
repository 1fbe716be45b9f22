"""Fingerprint goldens modeled on util/fingerprint_test.go's public cases:
the pairs the reference fingerprints EQUAL must fingerprint equal here too
(truncation repair + IN-list collapse), Spark and DuckDB must agree bit for
bit, and the one declared divergence (alias changes) is pinned as such."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from collector_spark.functions.fingerprint import fingerprint, oracle_fingerprint

# groups that must share one fingerprint (util/fingerprint_test.go:13-56)
EQUAL_GROUPS = [
    [
        'DELETE FROM x WHERE "id" IN ($1)',
        'DELETE FROM x WHERE "id" IN (12450548, 12450547, 12450546, 124',
        'DELETE FROM x WHERE "id" IN (15485697, 15485694, 15485693, 154',
    ],
    [
        "SELECT * FROM x WHERE y = ''",
        "SELECT * FROM x WHERE y = '",
    ],
    [
        "INSERT INTO x (a, b) VALUES (",
        "INSERT INTO x (a, b) VALUES ()",
    ],
    [
        "SELECT 1",
        "SELECT 2",
        "SELECT  999",
    ],
    [
        "SELECT * FROM t WHERE a IN ($1, $2, $3)",
        "SELECT * FROM t WHERE a in (1, 2)",
        "SELECT * FROM t WHERE a IN (?)".replace("?", "55"),
    ],
]

# pairs that must stay distinct
DISTINCT_PAIRS = [
    ("SELECT * FROM x", "SELECT * FROM y"),
    ("SELECT 1", "SELECT 1, 2"),
    ("SELECT 1", "SELINVALID"),
]

ALL_TEXTS = sorted(
    {t for g in EQUAL_GROUPS for t in g} | {t for p in DISTINCT_PAIRS for t in p}
)


@pytest.fixture(scope="module")
def spark_fps(spark):
    df = spark.createDataFrame([(t,) for t in ALL_TEXTS], ["q"])
    rows = df.select("q", fingerprint(F.col("q")).alias("fp")).collect()
    return {r["q"]: r["fp"] for r in rows}


def test_reference_equal_groups_fingerprint_equal(spark_fps):
    for group in EQUAL_GROUPS:
        fps = {spark_fps[t] for t in group}
        assert len(fps) == 1, (group, fps)


def test_distinct_queries_stay_distinct(spark_fps):
    for a, b in DISTINCT_PAIRS:
        assert spark_fps[a] != spark_fps[b], (a, b)


def test_duckdb_oracle_agrees_bit_for_bit(spark_fps):
    con = duckdb.connect()
    expr = oracle_fingerprint("q")
    for text, want in spark_fps.items():
        got = con.execute(f"SELECT {expr} FROM (SELECT ? AS q)", [text]).fetchone()[0]
        assert got == want, text
    con.close()


def test_alias_divergence_is_declared(spark_fps, spark):
    """pg_query's parse-tree hash makes 'AS "abc"' == 'AS "a' — a text-level
    normalizer cannot; the module docstring declares this. Pin the declared
    behavior so an accidental 'fix' fails loudly and prompts a doc update."""
    df = spark.createDataFrame(
        [('SELECT * FROM x AS "abc"',), ('SELECT * FROM x AS "a',)], ["q"]
    )
    fps = [r["fp"] for r in df.select(fingerprint(F.col("q")).alias("fp")).collect()]
    assert fps[0] != fps[1]
