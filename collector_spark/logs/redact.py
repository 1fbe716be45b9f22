"""U8 — secret redaction (logs/replace.go:13-42, markers at
state/logs.go:121-127).

The reference marks secret *spans* during classification — byte ranges
with a kind per line — then splices '[redacted]' over the sorted spans
before upload. Two renderings here:

  redact_secondaries    — the codegen fast path: the span set reduces to a
                          regexp_replace when the only markers on a line
                          are the quoted-literal kind (oracle-checked).
  redact_with_markers   — the faithful marker pipeline: an Arrow-batched
                          pandas UDF produces LogSecretMarker-shaped
                          array<struct<byte_start, byte_end, kind>> per
                          line (statement_text literals AND token-shaped
                          credentials), and the splice walks the sorted
                          spans exactly like logs/replace.go:13-42.
                          tests/test_redact_markers.py pins the splice
                          against the regex path where the span sets
                          coincide.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from collector_spark.logs.associate import associate_secondaries

_SECRET_RE = r"'[^']*'"


def redact_secondaries(spark: SparkSession) -> DataFrame:
    sec = associate_secondaries(spark)
    needs = F.col("secondary_level").isin("STATEMENT", "DETAIL")
    return sec.select(
        "pid",
        "primary_seq",
        "secondary_seq",
        "secondary_level",
        F.when(
            needs,
            F.regexp_replace(F.col("secondary_content"), _SECRET_RE, "[redacted]"),
        )
        .otherwise(F.col("secondary_content"))
        .alias("redacted_content"),
    )


def redact_secondaries_q(spark: SparkSession) -> DataFrame:
    return redact_secondaries(spark).orderBy("pid", "secondary_seq")


MARKER_SCHEMA = StructType(
    [
        StructField("pid", IntegerType()),
        StructField("primary_seq", LongType()),
        StructField("secondary_seq", LongType()),
        StructField("secondary_level", StringType()),
        StructField(
            "markers",
            ArrayType(
                StructType(
                    [
                        StructField("byte_start", IntegerType()),
                        StructField("byte_end", IntegerType()),
                        StructField("kind", StringType()),
                    ]
                )
            ),
        ),
        StructField("redacted_content", StringType()),
    ]
)

# marker kinds (state/logs.go:121-127): quoted statement_text literals and
# bare token-shaped credentials. Compiled as BYTES patterns: the marker
# contract is byte offsets into the UTF-8 content (LogSecretMarker), so the
# scan runs over content.encode('utf-8') — char offsets would disagree with
# the reference whenever the line contains multi-byte UTF-8. The patterns
# are pure ASCII, so byte-wise matching finds the same spans.
_MARKER_KINDS = (("statement_text", rb"'[^']*'"), ("credential", rb"\btok_[0-9]+\b"))


def _mark_and_splice(content: str, needs: bool) -> tuple[list, str]:
    import re

    if not needs or content is None:
        return [], content
    data = content.encode("utf-8")
    spans: list[tuple[int, int, str]] = []
    for kind, rx in _MARKER_KINDS:
        for m in re.finditer(rx, data):
            spans.append((m.start(), m.end(), kind))
    # sort + drop spans nested inside an earlier one (replace.go splices
    # sorted, non-overlapping markers)
    spans.sort()
    kept: list[tuple[int, int, str]] = []
    for s in spans:
        if kept and s[0] < kept[-1][1]:
            continue
        kept.append(s)
    out, cursor = [], 0
    for start, end, _ in kept:
        out.append(data[cursor:start])
        out.append(b"[redacted]")
        cursor = end
    out.append(data[cursor:])
    # span boundaries sit on ASCII quote/token bytes, so the spliced byte
    # string is always valid UTF-8
    return [
        {"byte_start": s, "byte_end": e, "kind": k} for s, e, k in kept
    ], b"".join(out).decode("utf-8")


def redact_with_markers(spark: SparkSession) -> DataFrame:
    """Marker-based redaction: spans computed per line, then spliced."""
    sec = associate_secondaries(spark).select(
        "pid", "primary_seq", "secondary_seq", "secondary_level", "secondary_content"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for r in pdf.itertuples(index=False):
                needs = r.secondary_level in ("STATEMENT", "DETAIL")
                markers, redacted = _mark_and_splice(r.secondary_content, needs)
                rows.append(
                    (
                        r.pid,
                        r.primary_seq,
                        r.secondary_seq,
                        r.secondary_level,
                        markers,
                        redacted,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MARKER_SCHEMA.fields]
            )

    return sec.mapInPandas(run, MARKER_SCHEMA).orderBy("pid", "secondary_seq")


def oracle_redact(associated_cte: str) -> str:
    rx = _SECRET_RE.replace("'", "''")
    return f"""
WITH assoc AS ({associated_cte})
SELECT pid, primary_seq, secondary_seq, secondary_level,
  CASE WHEN secondary_level IN ('STATEMENT', 'DETAIL')
       THEN regexp_replace(secondary_content, '{rx}', '[redacted]', 'g')
       ELSE secondary_content END AS redacted_content
FROM assoc
ORDER BY pid, secondary_seq
"""


def redact_markers_json_q(spark: SparkSession) -> DataFrame:
    """Driver-facing rendering of ``redact_with_markers``: the
    array<struct> marker column serialized with ``to_json`` so the result
    is all-scalar (the driver's pandas canonicalizer cannot factorize
    array cells). Same rows, same marker math — only the rendering
    differs; the struct form stays available for pipeline composition."""
    df = redact_with_markers(spark)
    return df.select(
        "pid",
        "primary_seq",
        "secondary_seq",
        "secondary_level",
        F.to_json("markers").alias("markers_json"),
        "redacted_content",
    ).orderBy("pid", "secondary_seq")


def oracle_redact_markers_json(associated_cte: str) -> str:
    """Oracle for the JSON rendering: the quote-pair span derivation from
    ``oracle_marker_spans`` (hash-verified in r3), aggregated per line into
    the exact ``to_json`` byte layout, left-joined onto the redaction
    CASE. Lines with no spans render '[]' (to_json of an empty array)."""
    rx = _SECRET_RE.replace("'", "''")
    span_json = (
        "'{\"byte_start\":' || byte_start || ',\"byte_end\":' || byte_end"
        " || ',\"kind\":\"statement_text\"}'"
    )
    return f"""
WITH assoc AS ({associated_cte}),
needs AS (
  SELECT pid, primary_seq, secondary_seq, secondary_level,
         secondary_content AS content
  FROM assoc
  WHERE secondary_level IN ('STATEMENT', 'DETAIL') AND secondary_content IS NOT NULL
),
segs AS (
  SELECT pid, secondary_seq,
         unnest(string_split(content, '''')) AS seg,
         CAST(generate_subscripts(string_split(content, ''''), 1) AS INT) AS ord
  FROM needs
),
qpos AS (
  SELECT pid, secondary_seq, ord,
    CAST(SUM(len(seg)) OVER (PARTITION BY pid, secondary_seq ORDER BY ord
         ROWS UNBOUNDED PRECEDING) + ord - 1 AS INT) AS quote_pos,
    CAST(COUNT(*) OVER (PARTITION BY pid, secondary_seq) AS INT) AS nsegs
  FROM segs
),
quotes AS (
  SELECT *, LEAD(quote_pos) OVER (PARTITION BY pid, secondary_seq ORDER BY ord)
            AS next_pos
  FROM qpos WHERE ord <= nsegs - 1
),
spans AS (
  SELECT pid, secondary_seq,
    CAST((ord - 1) / 2 AS INT) AS marker_idx,
    quote_pos AS byte_start,
    next_pos + 1 AS byte_end
  FROM quotes
  WHERE ord % 2 = 1 AND next_pos IS NOT NULL
),
mjson AS (
  SELECT pid, secondary_seq,
    '[' || string_agg({span_json}, ',' ORDER BY marker_idx) || ']' AS markers_json
  FROM spans GROUP BY pid, secondary_seq
)
SELECT a.pid, a.primary_seq, a.secondary_seq, a.secondary_level,
  COALESCE(m.markers_json, '[]') AS markers_json,
  CASE WHEN a.secondary_level IN ('STATEMENT', 'DETAIL')
       THEN regexp_replace(a.secondary_content, '{rx}', '[redacted]', 'g')
       ELSE a.secondary_content END AS redacted_content
FROM assoc a
LEFT JOIN mjson m ON a.pid = m.pid AND a.secondary_seq = m.secondary_seq
ORDER BY a.pid, a.secondary_seq
"""


def marker_spans_q(spark: SparkSession) -> DataFrame:
    """Flattened marker spans: one row per redaction marker, exposing the
    byte_start/byte_end/kind fields as hashable scalars so the driver can
    oracle-check the marker math (the array-of-struct parent query
    ``redact_with_markers`` is rows-only by necessity).

    The fixture content is ASCII, so the oracle can derive byte offsets
    from quote positions; the Python side still computes true UTF-8 byte
    offsets (state/logs.go:121-127 contract).
    """
    df = redact_with_markers(spark)
    m = F.posexplode("markers")
    return (
        df.select(
            "pid",
            "primary_seq",
            "secondary_seq",
            "secondary_level",
            m.alias("marker_idx", "m"),
        )
        .select(
            "pid",
            "primary_seq",
            "secondary_seq",
            "secondary_level",
            F.col("marker_idx").cast("int").alias("marker_idx"),
            F.col("m.byte_start").alias("byte_start"),
            F.col("m.byte_end").alias("byte_end"),
            F.col("m.kind").alias("kind"),
        )
        .orderBy("pid", "secondary_seq", "marker_idx")
    )


def oracle_marker_spans(associated_cte: str) -> str:
    """Quote-pair span derivation: the i-th marker covers the (2i-1)-th to
    (2i)-th single-quote byte (the ``'[^']*'`` matches pair consecutive
    quotes; credential-shaped tokens always sit inside quoted literals in
    the fixture corpus, so the nested-span drop leaves statement_text spans
    only — verified by the kind distribution). Quote positions fall out of
    a cumulative sum over split segments — a per-line window, no Python."""
    return f"""
WITH assoc AS ({associated_cte}),
needs AS (
  SELECT pid, primary_seq, secondary_seq, secondary_level,
         secondary_content AS content
  FROM assoc
  WHERE secondary_level IN ('STATEMENT', 'DETAIL') AND secondary_content IS NOT NULL
),
segs AS (
  SELECT pid, primary_seq, secondary_seq, secondary_level,
         unnest(string_split(content, '''')) AS seg,
         CAST(generate_subscripts(string_split(content, ''''), 1) AS INT) AS ord
  FROM needs
),
qpos AS (
  SELECT pid, primary_seq, secondary_seq, secondary_level, ord,
    CAST(SUM(len(seg)) OVER (PARTITION BY pid, secondary_seq ORDER BY ord
         ROWS UNBOUNDED PRECEDING) + ord - 1 AS INT) AS quote_pos,
    CAST(COUNT(*) OVER (PARTITION BY pid, secondary_seq) AS INT) AS nsegs
  FROM segs
),
quotes AS (
  SELECT *, LEAD(quote_pos) OVER (PARTITION BY pid, secondary_seq ORDER BY ord)
            AS next_pos
  FROM qpos WHERE ord <= nsegs - 1
)
SELECT pid, primary_seq, secondary_seq, secondary_level,
  CAST((ord - 1) / 2 AS INT) AS marker_idx,
  quote_pos AS byte_start,
  next_pos + 1 AS byte_end,
  'statement_text' AS kind
FROM quotes
WHERE ord % 2 = 1 AND next_pos IS NOT NULL
ORDER BY pid, secondary_seq, marker_idx
"""
