"""Scale contract proof for the dense-idx dimension builder (core/dims.py):
the idx equals the global sorted rank (what the naive single-partition
window computed), but the executed plan contains NO Exchange
SinglePartition — every distinct key no longer funnels through one task."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from collector_spark.core.dims import dense_index


def _naive_rank(df, key_cols, idx_name):
    return df.select(*key_cols).distinct().withColumn(
        idx_name, (F.row_number().over(Window.orderBy(*key_cols)) - 1).cast("int")
    )


def test_dense_index_matches_global_sorted_rank(prepared_spark):
    spark = prepared_spark
    src = spark.table("stmt_snap2")
    got = dense_index(src, ["query_id"], "idx").orderBy("query_id").collect()
    want = _naive_rank(src, ["query_id"], "idx").orderBy("query_id").collect()
    assert got == want
    assert len(got) > 100  # meaningful key space, not a trivial dim


def test_dense_index_multi_key_and_density(prepared_spark):
    spark = prepared_spark
    src = spark.table("stmt_snap2")
    keys = ["database_oid", "user_oid"]
    rows = dense_index(src, keys, "idx").collect()
    idxs = sorted(r["idx"] for r in rows)
    assert idxs == list(range(len(rows)))  # dense, 0-based, no gaps
    ordered = sorted(rows, key=lambda r: (r["database_oid"], r["user_oid"]))
    assert [r["idx"] for r in ordered] == list(range(len(rows)))


def test_dense_index_plan_has_no_single_partition_exchange(prepared_spark):
    spark = prepared_spark
    d = dense_index(spark.table("stmt_snap2"), ["query_id"], "idx")
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_statement_fact_plan_has_no_single_partition_exchange(prepared_spark):
    from collector_spark.operators.snapshot import assemble_statement_fact

    spark = prepared_spark
    fact = assemble_statement_fact(spark)
    plan = fact._jdf.queryExecution().executedPlan().toString()
    # the final .orderBy for oracle determinism is rangepartitioning — fine;
    # what must be gone is the all-keys-through-one-task window exchange
    assert "SinglePartition" not in plan, plan


def test_dense_index_ranks_null_keys_last(prepared_spark):
    """Oracles rank with DuckDB's default NULLS LAST; a nullable dim key
    (e.g. client_addr of a local standby) must get the highest idx, not 0
    as Spark's nulls-first default would give."""
    spark = prepared_spark
    src = spark.createDataFrame(
        [("b",), (None,), ("a",), ("c",), (None,)], ["k"]
    )
    rows = {r["k"]: r["idx"] for r in dense_index(src, ["k"], "idx").collect()}
    assert rows == {"a": 0, "b": 1, "c": 2, None: 3}
