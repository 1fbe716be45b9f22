"""U6 unbounded-depth contract: the fixpoint flatten must visit EVERY node
of arbitrarily deep plans — pinned by comparing the flattened row count to
the raw count of "Node Type" keys, and by the depth-5 fixture branch."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_flatten_reaches_depth_five(prepared_spark):
    from collector_spark.logs.querysample import plan_normalize

    df = plan_normalize(prepared_spark)
    paths = {r["path"] for r in df.select("path").distinct().collect()}
    assert "Plans[0].Plans[0].Plans[0].Plans[0]" in paths


def test_flatten_visits_every_node(prepared_spark):
    from collector_spark.logs.querysample import plan_normalize

    df = plan_normalize(prepared_spark)
    raw = (
        prepared_spark.table("query_samples")
        .select(
            F.sum(F.size(F.split(F.col("plan_json"), '"Node Type"')) - 1).alias("n")
        )
        .collect()[0]["n"]
    )
    assert df.count() == raw
