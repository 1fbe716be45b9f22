"""Query fingerprinting and normalization (U1/U2).

The reference fingerprints queries with a PostgreSQL parse-tree hash
(util/fingerprint.go:13-33, via libpg_query) and normalizes constants to
placeholders (util/normalize.go:13-32). libpg_query bindings (pglast) are
not available in this environment, so this engine declares its own
*internally consistent* semantics (SURVEY.md §7.3 fallback note):

  normalize: string literals -> ?, numeric literals -> ?, whitespace
             collapsed — the same constant-erasure contract
             pg_stat_statements applies, minus parse-tree awareness.
  fingerprint: first 60 bits of md5(normalized text) as a signed BIGINT.

md5 was chosen (not Spark's xxhash64) because it is the one hash both Spark
and DuckDB compute identically, which keeps every fingerprint-grouped
operator oracle-checkable end to end. All of this is built-in JVM expression
work — no Python UDF in the hot path.

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

# Order matters: erase string literals before numbers so digits inside
# strings don't leave stray placeholders. Mirrored verbatim in ORACLE_*.
_RE_STRING = r"'[^']*'"
_RE_NUMBER = r"\b[0-9]+(\.[0-9]+)?\b"
_RE_SPACE = r"\s+"


def normalize_query(col: Column) -> Column:
    """Constant-erased query text (U2)."""
    out = F.regexp_replace(col, _RE_STRING, "?")
    out = F.regexp_replace(out, _RE_NUMBER, "?")
    out = F.regexp_replace(out, _RE_SPACE, " ")
    return F.trim(out)


def fingerprint(text_col: Column) -> Column:
    """Deterministic 60-bit fingerprint of the normalized text (U1)."""
    norm = normalize_query(text_col)
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
def oracle_normalize(expr: str) -> str:
    re_string = _RE_STRING.replace("'", "''")  # SQL string-literal escaping
    return (
        "trim(regexp_replace(regexp_replace(regexp_replace("
        f"{expr}, '{re_string}', '?', 'g'),"
        " '\\b[0-9]+(\\.[0-9]+)?\\b', '?', 'g'),"
        " '\\s+', ' ', 'g'))"
    )


def oracle_fingerprint(expr: str) -> str:
    norm = oracle_normalize(expr)
    fp = f"CAST(('0x' || substr(md5({norm}), 1, 15)) AS BIGINT)"
    return (
        f"CASE WHEN {expr} IS NULL THEN {FP_UNAVAILABLE} "
        f"WHEN {expr} = '<insufficient privilege>' THEN {FP_INSUFFICIENT_PRIVILEGE} "
        f"ELSE {fp} END"
    )
