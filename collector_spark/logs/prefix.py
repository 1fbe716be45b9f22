"""U9 — log_line_prefix compiler (logs/parse.go:59-184,376-432).

PostgreSQL's ``log_line_prefix`` is a printf-style template; the reference
compiles it into one capture regex in the driver process and swaps it when
settings change. Same here: compile once, pass the regex string into the
(JVM-side) regexp functions — never a per-row Python UDF.

Supported escapes (the ones the reference handles for its recommended
prefixes): %m %t %p %l %u %d %a %h %e %r %q %%.
"""

from __future__ import annotations

import re

# regex fragment per escape; capture-group name per escape (None = no group)
_ESCAPES: dict[str, tuple[str, str | None]] = {
    "m": (r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(?:\.\d+)? [A-Z]+)", "occurred_at"),
    "t": (r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2} [A-Z]+)", "occurred_at"),
    "p": (r"(\d+)", "pid"),
    "l": (r"(\d+)", "line_no"),
    "u": (r"([^,\]\s]*)", "username"),
    "d": (r"([^,\]\s]*)", "database"),
    "a": (r"([^,\]\s]*)", "application"),
    "h": (r"([^,\]\s]*)", "host"),
    "e": (r"([0-9A-Z]{5})", "sqlstate"),
    # remote host+port or [local] (parse.go:94-97) — optional, as in the
    # reference (an idle-in-background line renders nothing); used by the
    # built-in Amazon RDS prefix '%t:%r:%u@%d:[%p]:'
    "r": (r"((?:[a-zA-Z0-9:.-]+\(\d{1,5}\)|\[local\])?)", "remote_host"),
    # remaining reference escapes (parse.go:104-184) so every built-in
    # prefix LogPrefixCustom1..16 / Azure / Heroku compiles
    "c": (r"((?:[0-9a-f]{1,8}\.[0-9a-f]{1,8})?)", "session_id"),
    "s": (r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2} (?:[A-Z]{1,4}|[+-]\d+))", "process_start"),
    "v": (r"((?:\d+/\d+)?)", "virtual_txid"),
    "x": (r"(\d*)", "txid"),
    "i": (r"((?:[A-Z_ ]+)?)", "command_tag"),
    "n": (r"(\d+\.\d+)", "occurred_at_epoch"),
    "b": (r"([a-z ]+)", "backend_type"),
    "P": (r"(\d*)", "leader_pid"),
    "Q": (r"(-?\d+)", "query_id"),
}

LEVELS = (
    "DEBUG5|DEBUG4|DEBUG3|DEBUG2|DEBUG1|DEBUG|INFO|NOTICE|WARNING|ERROR|"
    "LOG|FATAL|PANIC|DETAIL|HINT|CONTEXT|STATEMENT|QUERY"
)

# The prefix used by the log_raw fixture ('LogPrefixCustom3'-like,
# logs/parse.go:24,42 in the reference).
DEFAULT_PREFIX = "%m [%p] [user=%u,db=%d,app=%a] "


def compile_prefix(prefix: str = DEFAULT_PREFIX) -> tuple[str, list[str]]:
    """Translate a log_line_prefix template into (regex, group names).

    ``%q`` means everything after it is only present for session processes
    (logs/parse.go:376-432) — background-worker lines stop the prefix
    there. The compiled regex wraps the post-%q portion in an optional
    non-capturing group, so both line shapes parse; the %q-gated capture
    groups yield empty strings for background processes.

    The returned regex has one trailing group pair for LEVEL and content;
    group order = returned names + ['log_level', 'content'].
    """
    out: list[str] = ["^"]
    groups: list[str] = []
    optional_open = False
    i = 0
    while i < len(prefix):
        ch = prefix[i]
        if ch == "%" and i + 1 < len(prefix):
            esc = prefix[i + 1]
            if esc == "%":
                out.append(re.escape("%"))
            elif esc == "q":
                if not optional_open:
                    out.append("(?:")
                    optional_open = True
            elif esc in _ESCAPES:
                frag, name = _ESCAPES[esc]
                out.append(frag)
                if name:
                    groups.append(name)
            else:
                out.append(re.escape("%" + esc))
            i += 2
            continue
        out.append(re.escape(ch))
        i += 1
    if optional_open:
        out.append(")?")
    out.append(f"({LEVELS}):  ?(.*)$")
    return "".join(out), groups + ["log_level", "content"]
