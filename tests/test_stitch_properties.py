"""Property-based check of the continuation stitcher (SURVEY §7.4 hard
part 2): random primary/continuation sequences per pid through Spark vs a
direct Python model of logs/stream/stream.go:202-231 — continuations fold
into the preceding primary, leading orphans drop."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# per pid: an ordered list of (is_primary, token)
lines_strategy = st.dictionaries(
    st.integers(min_value=1, max_value=3),  # pid
    st.lists(
        st.tuples(st.booleans(), st.integers(min_value=0, max_value=9)),
        min_size=0,
        max_size=8,
    ),
    max_size=3,
)


def _model(per_pid: dict) -> dict:
    out = {}
    for pid, seq_lines in per_pid.items():
        current = None
        for i, (is_primary, tok) in enumerate(seq_lines):
            if is_primary:
                current = (pid, i)
                out[current] = [f"c{tok}"]
            elif current is not None:
                out[current].append(f"c{tok}")
            # else: leading orphan -> dropped
    return {k: ("\n".join(v), len(v)) for k, v in out.items()}


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(per_pid=lines_strategy)
def test_stitch_matches_model(prepared_spark, per_pid):
    from collector_spark.logs.stitch import stitch_df

    rows = [
        (pid, i, "LOG" if is_primary else "UNKNOWN", "u", "d", "a", f"c{tok}")
        for pid, seq_lines in per_pid.items()
        for i, (is_primary, tok) in enumerate(seq_lines)
    ]
    schema = (
        "pid int, seq long, log_level string, username string,"
        " database string, application string, content string"
    )
    df = prepared_spark.createDataFrame(rows, schema)
    got = {
        (r["pid"], r["seq"]): (r["content"], r["line_count"])
        for r in stitch_df(df).collect()
    }
    assert got == _model(per_pid)
