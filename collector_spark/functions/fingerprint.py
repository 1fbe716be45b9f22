"""Query fingerprinting and normalization (U1/U2).

The reference fingerprints queries with a PostgreSQL parse-tree hash
(util/fingerprint.go:13-33, via libpg_query) and normalizes constants to
placeholders (util/normalize.go:13-32). libpg_query bindings (pglast) are
not available in this environment, so this engine declares its own
*internally consistent* semantics (SURVEY.md §7.3 fallback note) — upgraded
to reproduce the reference's public text-level behaviors:

  repair:      util/query_text.go:26-42 (fixTruncatedQuery) exactly —
               balance an odd number of ' or ", close unclosed parens —
               so truncated query texts group with their full forms.
  normalize:   string literals -> ?, bind params ($1) -> ?, numeric
               literals -> ?, whitespace collapsed — the constant-erasure
               contract pg_stat_statements applies, minus parse-tree
               awareness.
  fingerprint: first 60 bits of md5 over the repaired+normalized text with
               placeholder IN-lists collapsed (``IN (?, ?, ?)`` -> ``IN
               (?)``), mirroring pg_query's list-length-insensitive
               fingerprint (util/fingerprint_test.go: ``IN ($1)`` ==
               ``IN (12450548, 12450547, 124``).

Known divergence from the parse-tree hash (declared): alias/identifier
changes alter the fingerprint (``AS "abc"`` vs ``AS "a``), and repair is
applied unconditionally rather than only on parse failure — harmless for
well-formed SQL where quotes and parens balance.

md5 was chosen (not Spark's xxhash64) because it is the one hash both Spark
and DuckDB compute identically, which keeps every fingerprint-grouped
operator oracle-checkable end to end. All of this is built-in JVM expression
work — no Python UDF in the hot path.

Parser-question CLOSURE (r12, permanent): both parse-tree routes are
environment-blocked — pglast (libpg_query) confirmed uninstallable in
rounds 2-11, and sqlglot (the r10 verdict's pure-Python candidate) is
likewise absent (`import sqlglot` -> ModuleNotFoundError) with package
installs forbidden in this container. The text-level contract above is the
SHIPPING semantics, not a temporary stopgap; revisit only if the
environment gains a SQL parser.

Sentinels (input/postgres/statements.go:70-76, output/transform/util.go:12-17):
  '<insufficient privilege>'      -> fingerprint 0, kept as its own group
  '/* pganalyze-collector */ ...' -> dropped upstream by the P6 filter
  missing text                    -> fingerprint -1 ('<unavailable>' group)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FP_INSUFFICIENT_PRIVILEGE = 0
FP_UNAVAILABLE = -1

# Order matters: erase string literals before bind params before numbers so
# digits inside strings/binds don't leave stray placeholders. Mirrored
# verbatim in ORACLE_*.
_RE_STRING = r"'[^']*'"
_RE_BIND = r"\$[0-9]+"
_RE_NUMBER = r"\b[0-9]+(\.[0-9]+)?\b"
_RE_SPACE = r"\s+"
# placeholder IN-list (post-normalization, so members are all '?'):
# IN (?, ?, ?) -> IN (?). Case-insensitive like the SQL keyword.
_RE_IN_LIST = r"(?i)\bIN\s*\(\s*\?(\s*,\s*\?)*\s*\)"
_IN_CANON = "IN (?)"


def _char_count(col: Column, ch: str) -> Column:
    return F.length(col) - F.length(F.replace(col, F.lit(ch), F.lit("")))


def repair_truncated(col: Column) -> Column:
    """fixTruncatedQuery (util/query_text.go:26-42) as JVM expressions:
    append a closing ' / " when their counts are odd, then close any
    remaining open parens."""
    q = F.when(_char_count(col, "'") % 2 == 1, F.concat(col, F.lit("'"))).otherwise(col)
    q = F.when(_char_count(q, '"') % 2 == 1, F.concat(q, F.lit('"'))).otherwise(q)
    opens = _char_count(q, "(") - _char_count(q, ")")
    return F.concat(q, F.repeat(F.lit(")"), F.greatest(opens, F.lit(0)).cast("int")))


def normalize_query(col: Column) -> Column:
    """Constant-erased query text (U2)."""
    out = F.regexp_replace(col, _RE_STRING, "?")
    out = F.regexp_replace(out, _RE_BIND, "?")
    out = F.regexp_replace(out, _RE_NUMBER, "?")
    out = F.regexp_replace(out, _RE_SPACE, " ")
    return F.trim(out)


def fingerprint(text_col: Column) -> Column:
    """Deterministic 60-bit fingerprint (U1): repair truncation, erase
    constants, collapse placeholder IN-lists, hash."""
    norm = F.regexp_replace(
        normalize_query(repair_truncated(text_col)), _RE_IN_LIST, _IN_CANON
    )
    fp = F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("long")
    return (
        F.when(text_col.isNull(), F.lit(FP_UNAVAILABLE))
        .when(text_col == "<insufficient privilege>", F.lit(FP_INSUFFICIENT_PRIVILEGE))
        .otherwise(fp)
    )


def is_collector_query(text_col: Column) -> Column:
    """P6 filter predicate (input/postgres/statements.go:455-476)."""
    return text_col.startswith("/* pganalyze-collector */")


# DuckDB oracle equivalents (same regex text, DuckDB regexp_replace needs
# the explicit 'g' flag where Spark replaces all matches by default).
def oracle_repair(expr: str) -> str:
    quotes = f"length({expr}) - length(replace({expr}, '''', ''))"
    q1 = f"CASE WHEN ({quotes}) % 2 = 1 THEN {expr} || '''' ELSE {expr} END"
    dquotes = f"length({q1}) - length(replace({q1}, '\"', ''))"
    q2 = f"CASE WHEN ({dquotes}) % 2 = 1 THEN ({q1}) || '\"' ELSE ({q1}) END"
    opens = f"length({q2}) - length(replace({q2}, '(', ''))"
    closes = f"length({q2}) - length(replace({q2}, ')', ''))"
    return f"({q2}) || repeat(')', greatest(({opens}) - ({closes}), 0))"


def oracle_normalize(expr: str) -> str:
    re_string = _RE_STRING.replace("'", "''")  # SQL string-literal escaping
    return (
        "trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        f"{expr}, '{re_string}', '?', 'g'),"
        " '\\$[0-9]+', '?', 'g'),"
        " '\\b[0-9]+(\\.[0-9]+)?\\b', '?', 'g'),"
        " '\\s+', ' ', 'g'))"
    )


def oracle_fingerprint(expr: str) -> str:
    norm = (
        f"regexp_replace({oracle_normalize(oracle_repair(expr))},"
        f" '(?i)\\bIN\\s*\\(\\s*\\?(\\s*,\\s*\\?)*\\s*\\)', 'IN (?)', 'g')"
    )
    fp = f"CAST(('0x' || substr(md5({norm}), 1, 15)) AS BIGINT)"
    return (
        f"CASE WHEN {expr} IS NULL THEN {FP_UNAVAILABLE} "
        f"WHEN {expr} = '<insufficient privilege>' THEN {FP_INSUFFICIENT_PRIVILEGE} "
        f"ELSE {fp} END"
    )
