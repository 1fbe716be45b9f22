"""Audit: for every registered query, compare the DuckDB oracle's output
column types against the Spark DataFrame schema, and flag any column where
one engine yields an integer type and the other a floating type (or where
DuckDB yields HUGEINT, whose pandas conversion is float64 on duckdb 1.0 —
a driver-hash hazard even when values are numerically identical).

The repo's own oracle compare (tests/oracle.py) coerces int-vs-float, so
these skews pass locally; the driver's value-hash may not coerce. Root
cause of the r7 `ml_sequence_packing` red row: window SUM(BIGINT) ->
HUGEINT -> pandas float64.
"""

import os
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")

import duckdb

sys.path.insert(0, "/root/repo")

from collector_spark import registry
from collector_spark.fixtures.defs import oracle_query
from collector_spark.session import get_spark

INTY = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT",
        "UINTEGER", "UBIGINT"}
FLOATY = {"FLOAT", "DOUBLE"}

SPARK_INTY = {"tinyint", "smallint", "int", "bigint"}
SPARK_FLOATY = {"float", "double"}


def main() -> None:
    registry.load_all()
    spark = get_spark("dtype_audit")
    registry.prepare(spark, SF_DIR)
    con = duckdb.connect()
    for name in ("region nation customer supplier part orders lineitem "
                 "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')"
        )
    bad = 0
    for qname in sorted(registry.REGISTRY):
        q = registry.REGISTRY[qname]
        if q.oracle is None:
            continue
        try:
            sdf = q.spark_fn(spark)
            spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema}
            rel = con.sql(f"SELECT * FROM ({oracle_query(q.oracle, q.fixtures)}) LIMIT 0")
            duck_types = dict(zip(rel.columns, (str(t) for t in rel.types)))
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {qname}: {type(e).__name__}: {e}")
            bad += 1
            continue
        if set(spark_types) != set(duck_types):
            print(f"COLS {qname}: spark={sorted(spark_types)} duck={sorted(duck_types)}")
            bad += 1
            continue
        for col, st in spark_types.items():
            dt = duck_types[col]
            d_int = dt in INTY
            d_float = dt in FLOATY or dt == "HUGEINT"
            s_int = st in SPARK_INTY
            s_float = st in SPARK_FLOATY
            if dt == "HUGEINT":
                print(f"HUGE {qname}.{col}: duck=HUGEINT spark={st}")
                bad += 1
            elif (d_int and s_float) or (d_float and s_int):
                print(f"SKEW {qname}.{col}: duck={dt} spark={st}")
                bad += 1
            elif dt.startswith("DECIMAL") and not st.startswith("decimal"):
                print(f"DEC  {qname}.{col}: duck={dt} spark={st}")
                bad += 1
    print(f"\n{bad} flagged column/query issues")


if __name__ == "__main__":
    main()
