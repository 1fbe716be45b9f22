"""Property-based checks of the fingerprint/normalize fallback
(functions/fingerprint.py) — the declared §2.7 text-level contract.
hypothesis drives randomized SQL-ish texts through Spark and pins the
invariances the contract promises:

  P1  normalize is idempotent (a second pass changes nothing)
  P2  fingerprint ignores standalone numeric-literal VALUES
  P3  fingerprint ignores the width of existing whitespace runs
  P4  fingerprint ignores IN-list length and member kind (binds vs
      numbers vs strings) and the case of the IN keyword
  P5  truncation inside a trailing string literal or mid-number inside
      an IN list groups with the full form (the repair contract the
      goldens pin on the reference's own cases, here randomized)

Each example evaluates a small batch of variants in ONE Spark job.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

IDENT = st.sampled_from(["x", "tbl", "users", "order_items", "a_b", "t1"])
KEYWORD = st.sampled_from(["SELECT", "WHERE", "AND", "FROM", "JOIN", "ON"])
NUMBER = st.integers(min_value=0, max_value=10**9)
WS = st.sampled_from([" ", "  ", "\t", "\n", " \t ", "   "])


def _fps(spark, texts: list[str]) -> list[int]:
    from collector_spark.functions.fingerprint import fingerprint

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, q string"
    ).select("i", fingerprint(F.col("q")).alias("fp"))
    rows = {r["i"]: r["fp"] for r in df.collect()}
    return [rows[i] for i in range(len(texts))]


def _norms(spark, texts: list[str]) -> list[str]:
    from collector_spark.functions.fingerprint import normalize_query

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, q string"
    ).select("i", normalize_query(F.col("q")).alias("n"))
    rows = {r["i"]: r["n"] for r in df.collect()}
    return [rows[i] for i in range(len(texts))]


sqlish_fragment = st.one_of(
    KEYWORD,
    IDENT,
    NUMBER.map(str),
    st.integers(min_value=1, max_value=9).map(lambda i: f"${i}"),
    st.sampled_from(["'abc'", "'it is'", "''", "'123 $4'", "=", ",", "(", ")"]),
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(frags=st.lists(sqlish_fragment, min_size=1, max_size=12))
def test_normalize_is_idempotent(prepared_spark, frags):
    text = " ".join(frags)
    once, twice_src = _norms(prepared_spark, [text])[0], None
    twice = _norms(prepared_spark, [once])[0]
    assert twice == once, (text, once, twice)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    a=NUMBER,
    b=NUMBER,
    c=NUMBER,
    ident=IDENT,
)
def test_fingerprint_ignores_numeric_values(prepared_spark, a, b, c, ident):
    t1 = f"SELECT * FROM {ident} WHERE a = {a} AND b < {b} LIMIT {c}"
    t2 = f"SELECT * FROM {ident} WHERE a = {b} AND b < {c} LIMIT {a}"
    f1, f2 = _fps(prepared_spark, [t1, t2])
    assert f1 == f2


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ws=st.lists(WS, min_size=9, max_size=9))
def test_fingerprint_ignores_whitespace_width(prepared_spark, ws):
    base = "SELECT a , b FROM t WHERE c = 'v'"
    parts = base.split(" ")
    assert len(parts) == len(ws) + 1
    widened = parts[0] + "".join(w + p for w, p in zip(ws, parts[1:]))
    f1, f2 = _fps(prepared_spark, [base, widened])
    assert f1 == f2, (base, widened)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    members=st.lists(
        st.one_of(
            NUMBER.map(str),
            st.integers(min_value=1, max_value=99).map(lambda i: f"${i}"),
            st.sampled_from(["'v'", "'longer value'"]),
        ),
        min_size=1,
        max_size=8,
    ),
    kw=st.sampled_from(["IN", "in", "In"]),
)
def test_fingerprint_ignores_in_list_shape(prepared_spark, members, kw):
    t_many = f"DELETE FROM x WHERE id {kw} ({', '.join(members)})"
    t_one = "DELETE FROM x WHERE id IN ($1)"
    f1, f2 = _fps(prepared_spark, [t_many, t_one])
    assert f1 == f2, t_many


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    tail=st.text(
        alphabet="abcdefghij 0123456789", min_size=1, max_size=20
    ).filter(lambda s: s.strip()),
    cut=st.integers(min_value=0, max_value=100),
)
def test_truncated_string_literal_groups_with_full(prepared_spark, tail, cut):
    full = f"SELECT * FROM x WHERE y = '{tail}'"
    # cut inside the literal body: keep the opening quote, drop the rest
    keep = cut % (len(tail) + 1)
    trunc = f"SELECT * FROM x WHERE y = '{tail[:keep]}"
    f1, f2 = _fps(prepared_spark, [full, trunc])
    assert f1 == f2, (full, trunc)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    nums=st.lists(NUMBER.filter(lambda n: n >= 10), min_size=2, max_size=6),
    keep_digits=st.integers(min_value=1, max_value=3),
)
def test_truncated_in_list_groups_with_full(prepared_spark, nums, keep_digits):
    full = f"DELETE FROM x WHERE id IN ({', '.join(map(str, nums))})"
    # cut mid-number in the LAST member (the reference golden's shape:
    # '...12450546, 124') — at least one digit must survive the cut
    last = str(nums[-1])
    head = ", ".join(map(str, nums[:-1]))
    trunc = f"DELETE FROM x WHERE id IN ({head}, {last[: min(keep_digits, len(last))]}"
    f1, f2 = _fps(prepared_spark, [full, trunc])
    assert f1 == f2, (full, trunc)
