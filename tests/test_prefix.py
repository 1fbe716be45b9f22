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


def test_every_reference_builtin_prefix_compiles_and_parses():
    """Each built-in log_line_prefix the reference recognizes
    (parse.go:20-44) must compile and parse a representative line. Sample
    values per escape chosen to satisfy each fragment's shape."""
    import re

    from collector_spark.logs.prefix import compile_prefix

    samples = {
        "occurred_at": "2024-01-05 10:00:02 UTC",
        "remote_host": "10.0.0.1(5432)",
        "username": "alice",
        "database": "shop",
        "application": "app1",
        "host": "10.0.0.9",
        "sqlstate": "22012",
        "pid": "4242",
        "line_no": "7",
        "session_id": "65a1b2c3.4d5e",
        "process_start": "2024-01-05 09:00:00 UTC",
        "virtual_txid": "3/17",
        "txid": "998877",
        "command_tag": "SELECT",
        "occurred_at_epoch": "1704448802.123",
        "backend_type": "client backend",
        "leader_pid": "4100",
        "query_id": "-123456789",
    }
    ms = {"occurred_at": "2024-01-05 10:00:02.123 UTC"}
    prefixes = {
        "rds": "%t:%r:%u@%d:[%p]:",
        "azure": "%t-%c-",
        "custom1": "%m [%p][%v] : [%l-1] %q[app=%a] ",
        "custom2": "%t [%p-%l] %q%u@%d ",
        "custom3": "%m [%p] %q[user=%u,db=%d,app=%a] ",
        "custom4": "%m [%p] %q[user=%u,db=%d,app=%a,host=%h] ",
        "custom5": "%t [%p]: [%l-1] user=%u,db=%d - PG-%e ",
        "custom6": "%t [%p]: [%l-1] user=%u,db=%d,app=%a,client=%h ",
        "custom7": "%t [%p]: [%l-1] [trx_id=%x] user=%u,db=%d ",
        "custom8": "[%p]: [%l-1] db=%d,user=%u ",
        "custom9": "%m %r %u %a [%c] [%p] ",
        "custom10": "%m [%p]: [%l-1] db=%d,user=%u ",
        "custom11": "pid=%p,user=%u,db=%d,app=%a,client=%h ",
        "custom12": "user=%u,db=%d,app=%a,client=%h ",
        "custom13": "%p-%s-%c-%l-%h-%u-%d-%m ",
        "custom14": "%m [%p][%b][%v][%x] %q[user=%u,db=%d,app=%a] ",
        "custom15": "%m [%p] %q%u@%d ",
        "custom16": "%t [%p] %q%u@%d %h ",
        "simple": "%m [%p] ",
    }
    for name, prefix in prefixes.items():
        rx, names = compile_prefix(prefix)
        # render a concrete line for this prefix by substituting samples
        rendered = []
        i = 0
        while i < len(prefix):
            if prefix[i] == "%" and i + 1 < len(prefix):
                esc = prefix[i + 1]
                if esc == "%":
                    rendered.append("%")
                elif esc == "q":
                    pass
                else:
                    from collector_spark.logs.prefix import _ESCAPES

                    frag_name = _ESCAPES[esc][1]
                    val = samples[frag_name]
                    if esc == "m":
                        val = ms["occurred_at"]
                    rendered.append(val)
                i += 2
                continue
            rendered.append(prefix[i])
            i += 1
        line = "".join(rendered) + "LOG:  duration: 1.5 ms"
        m = re.match(rx, line)
        assert m, (name, rx, line)
        got = dict(zip(names, m.groups()))
        assert got["log_level"] == "LOG", name
        assert got["content"] == "duration: 1.5 ms", name
        if "pid" in got and got["pid"]:
            assert got["pid"] == "4242", name
