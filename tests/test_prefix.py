"""U9 prefix compiler goldens — pure-regex tests (no Spark), table-driven
like the reference's logs/parse_test.go."""

from __future__ import annotations

import re

from collector_spark.logs.prefix import DEFAULT_PREFIX, compile_prefix


def test_default_prefix_parses_session_line():
    rx, groups = compile_prefix(DEFAULT_PREFIX)
    m = re.match(
        rx, "2024-01-05 10:00:00 UTC [1234] [user=u7,db=db_2,app=app-1] "
        "LOG:  checkpoint starting: time"
    )
    assert m
    got = dict(zip(groups, m.groups()))
    assert got["occurred_at"] == "2024-01-05 10:00:00 UTC"
    assert got["pid"] == "1234"
    assert got["username"] == "u7"
    assert got["database"] == "db_2"
    assert got["application"] == "app-1"
    assert got["log_level"] == "LOG"
    assert got["content"] == "checkpoint starting: time"


def test_q_escape_makes_session_suffix_optional():
    # %q: the user/db/app block only exists for session processes
    # (logs/parse.go:376-432)
    rx, groups = compile_prefix("%m [%p] %q[user=%u,db=%d] ")

    session = re.match(
        rx, "2024-01-05 10:00:00 UTC [99] [user=alice,db=prod] ERROR:  boom"
    )
    assert session
    got = dict(zip(groups, session.groups()))
    assert got["username"] == "alice"
    assert got["log_level"] == "ERROR"

    # background worker: prefix stops at %q — must still parse
    background = re.match(rx, "2024-01-05 10:00:01 UTC [7] LOG:  checkpoint complete")
    assert background
    got = dict(zip(groups, background.groups()))
    assert got["pid"] == "7"
    assert got["username"] is None
    assert got["log_level"] == "LOG"
    assert got["content"] == "checkpoint complete"


def test_unknown_escape_is_literal():
    rx, _ = compile_prefix("%Z ")
    assert re.match(rx, "%Z LOG:  x")


def test_amazon_rds_prefix_parses_reference_lines():
    """The built-in RDS prefix '%t:%r:%u@%d:[%p]:' (parse.go:20) must parse
    the reference's redaction-test lines (logs/replace_test.go:24-27)."""
    import re

    from collector_spark.logs.prefix import compile_prefix

    rx, names = compile_prefix("%t:%r:%u@%d:[%p]:")
    line = (
        "2018-03-11 20:00:02 UTC:1.1.1.1(2):a@b:[3]:LOG:"
        "  duration: 1242.570 ms  statement: SELECT 1"
    )
    m = re.match(rx, line)
    assert m, rx
    got = dict(zip(names, m.groups()))
    assert got["occurred_at"] == "2018-03-11 20:00:02 UTC"
    assert got["remote_host"] == "1.1.1.1(2)"
    assert got["username"] == "a" and got["database"] == "b"
    assert got["pid"] == "3" and got["log_level"] == "LOG"
    assert got["content"] == "duration: 1242.570 ms  statement: SELECT 1"

    local = re.match(rx, "2018-03-11 20:00:02 UTC:[local]:a@b:[3]:ERROR:  division by zero")
    assert local and dict(zip(names, local.groups()))["remote_host"] == "[local]"
