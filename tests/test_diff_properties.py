"""Property-based check of the diff kernel (core/diff.py) — the engine's
correctness hot spot (SURVEY §7.4). hypothesis drives random snapshot
pairs through Spark and compares against a direct Python model of
runner/diff.go semantics: new-key => cur, reset (cur < prev on the reset
column) => cur, otherwise cur - prev; gauges pass through; prev-only keys
drop."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

KEYS = st.integers(min_value=0, max_value=5)
VALS = st.integers(min_value=0, max_value=1_000)

snapshot = st.dictionaries(KEYS, st.tuples(VALS, VALS, VALS), max_size=6)


def _model(cur: dict, prev: dict) -> dict:
    out = {}
    for k, (calls, blocks, gauge) in cur.items():
        if k not in prev or calls < prev[k][0]:
            out[k] = (calls, blocks, gauge)
        else:
            out[k] = (calls - prev[k][0], blocks - prev[k][1], gauge)
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cur=snapshot, prev=snapshot)
def test_diff_kernel_matches_model(prepared_spark, cur, prev):
    from collector_spark.core.diff import diff_counters

    schema = "k long, calls long, blocks long, gauge long"
    cur_df = prepared_spark.createDataFrame(
        [(k, *v) for k, v in cur.items()], schema
    )
    prev_df = prepared_spark.createDataFrame(
        [(k, *v) for k, v in prev.items()], schema
    )
    got = {
        r["k"]: (r["calls"], r["blocks"], r["gauge"])
        for r in diff_counters(
            cur_df, prev_df, ["k"], ["calls", "blocks"], gauges=["gauge"],
            reset_col="calls",
        ).collect()
    }
    assert got == _model(cur, prev)
