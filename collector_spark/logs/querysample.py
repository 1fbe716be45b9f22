"""Query-sample analysis: sqlcommenter tags (U5) and EXPLAIN plan
normalization (U6).

Reference:
  U5  logs/querysample/tags.go:14-77 — lex comments out of the query text,
      parse sqlcommenter (key='value', URL-encoded) and marginalia
      (key:value) pairs. Here the comment extraction is a non-greedy regex
      (the reference uses the pg_query lexer; same result for well-formed
      single comments), the pairs explode to rows, and the decode handles
      the %XX escapes the fixture exercises (full QueryUnescape would need
      a UDF — documented subset).
  U6  logs/querysample/normalize.go:129-242 — walk the EXPLAIN JSON tree
      normalizing expression fields (Filter, Index Cond, Hash Cond, Output)
      with the U2 constant-erasure. The reference recurses unbounded, and
      so does the engine: the flatten iterates the JSON parse to a fixpoint
      (child ``Plans`` captured as raw-JSON strings, posexploded per level
      until a level is empty), so arbitrary-depth auto_explain plans fully
      normalize — no fixed schema depth, everything JVM-side and
      oracle-checkable against a recursive-CTE DuckDB oracle.

Scale: both are pure per-row projections (no shuffle, codegen-friendly);
the plan explode multiplies rows by node count only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

_COMMENT_RE = r"/\*(.+?)\*/"


def _decode(col):
    # full sqlcommenter URL-decode (tags.go:62-77 uses url.QueryUnescape):
    # '+' -> space, any %XX escape, multi-byte UTF-8 sequences — Spark's
    # native url_decode implements exactly that contract
    return F.url_decode(col)


def _oracle_urldecode(expr: str) -> str:
    # DuckDB twin of url.QueryUnescape without a url_decode builtin: split
    # on '%', hex-encode the literal runs, splice the escape bytes back in,
    # then decode the reassembled byte string as UTF-8 — handles multi-byte
    # sequences exactly ('caf%C3%A9' -> 'café')
    seg = f"string_split(replace({expr}, '+', ' '), '%')"
    # COALESCE: array_to_string of an empty list is NULL, not ''
    return (
        f"decode(unhex(hex(encode(({seg})[1])) || COALESCE(array_to_string("
        f"list_transform(({seg})[2:], p -> substr(p,1,2) || hex(encode(substr(p,3)))), ''), '')))"
    )


def comment_tags(spark: SparkSession) -> DataFrame:
    """U5: one row per (sample_id, tag_key, tag_value)."""
    q = spark.table("query_samples")
    comment = F.regexp_extract("query_text", _COMMENT_RE, 1)
    parts = q.select(
        "sample_id", F.explode(F.split(comment, ",")).alias("part")
    ).select("sample_id", F.trim(F.col("part")).alias("part"))

    key_eq = F.trim(F.regexp_extract("part", r"^([^=]*)=(.*)$", 1))
    val_eq = F.trim(F.regexp_extract("part", r"^([^=]*)=(.*)$", 2))
    # sqlcommenter iff it splits on '=' and the key carries no ':'
    is_sqlc = F.col("part").rlike("^[^=]*=") & ~key_eq.contains(":")
    is_marg = F.col("part").contains(":")

    unquoted = F.regexp_replace(val_eq, r"^'(.*)'$", "$1")
    key = F.when(is_sqlc, _decode(key_eq)).otherwise(
        F.trim(F.regexp_extract("part", r"^([^:]*):(.*)$", 1))
    )
    val = F.when(is_sqlc, _decode(unquoted)).otherwise(
        F.trim(F.regexp_extract("part", r"^([^:]*):(.*)$", 2))
    )
    return (
        parts.filter((F.col("part") != "") & (is_sqlc | is_marg))
        .select("sample_id", key.alias("tag_key"), val.alias("tag_value"))
        .orderBy("sample_id", "tag_key")
    )


def oracle_comment_tags() -> str:
    key_dec = _oracle_urldecode("trim(regexp_extract(part, '^([^=]*)=(.*)$', 1))")
    val_dec = _oracle_urldecode(
        "regexp_replace(trim(regexp_extract(part, '^([^=]*)=(.*)$', 2)),"
        " '^''(.*)''$', '\\1')"
    )
    return rf"""
WITH parts AS (
  SELECT sample_id,
    trim(unnest(string_split(regexp_extract(query_text, '/\*(.+?)\*/', 1), ','))) AS part
  FROM query_samples
),
typed AS (
  SELECT sample_id, part,
    regexp_matches(part, '^[^=]*=')
      AND NOT contains(trim(regexp_extract(part, '^([^=]*)=(.*)$', 1)), ':') AS is_sqlc,
    contains(part, ':') AS is_marg
  FROM parts WHERE part <> ''
)
SELECT sample_id,
  CASE WHEN is_sqlc
    THEN {key_dec}
    ELSE trim(regexp_extract(part, '^([^:]*):(.*)$', 1)) END AS tag_key,
  CASE WHEN is_sqlc
    THEN {val_dec}
    ELSE trim(regexp_extract(part, '^([^:]*):(.*)$', 2)) END AS tag_value
FROM typed
WHERE is_sqlc OR is_marg
ORDER BY sample_id, tag_key
"""


AUTO_EXPLAIN_RE = r"^duration: ([0-9.]+) ms +plan: (.*)"

_AE_SCHEMA = StructType(
    [
        StructField("Query Text", StringType()),
        StructField(
            "Plan",
            StructType(
                [
                    StructField("Node Type", StringType()),
                    StructField("Filter", StringType()),
                ]
            ),
        ),
    ]
)


def auto_explain_samples(spark: SparkSession) -> DataFrame:
    """Query-sample extraction from auto_explain log output (logs/analyze.go:
    37-44, extraction at :1532-1550): duration + embedded JSON plan, with
    the query text and plan expressions normalized via U2."""
    from collector_spark.functions.fingerprint import normalize_query
    from collector_spark.logs.stitch import stitch_lines

    lines = stitch_lines(spark).filter(F.col("content").rlike(AUTO_EXPLAIN_RE))
    plan = F.from_json(
        F.regexp_extract("content", AUTO_EXPLAIN_RE, 2), _AE_SCHEMA
    )
    return (
        lines.select(
            "pid",
            "seq",
            F.regexp_extract("content", AUTO_EXPLAIN_RE, 1)
            .cast("double")
            .alias("duration_ms"),
            plan.alias("p"),
        )
        .select(
            "pid",
            "seq",
            "duration_ms",
            normalize_query(F.col("p")["Query Text"]).alias("query_norm"),
            F.col("p")["Plan"]["Node Type"].alias("node_type"),
            normalize_query(F.col("p")["Plan"]["Filter"]).alias("filter_norm"),
        )
        .orderBy("pid", "seq")
    )


def oracle_auto_explain_samples(stitched_cte: str) -> str:
    from collector_spark.functions.fingerprint import oracle_normalize

    rx = AUTO_EXPLAIN_RE.replace("'", "''")
    qt = oracle_normalize(
        "json_extract_string(regexp_extract(content, '" + rx + "', 2), '$.\"Query Text\"')"
    )
    nt = (
        "json_extract_string(regexp_extract(content, '" + rx + "', 2),"
        " '$.Plan.\"Node Type\"')"
    )
    flt = oracle_normalize(
        "json_extract_string(regexp_extract(content, '" + rx + "', 2), '$.Plan.Filter')"
    )
    return f"""
WITH stitched AS ({stitched_cte})
SELECT pid, seq,
  CAST(regexp_extract(content, '{rx}', 1) AS DOUBLE) AS duration_ms,
  {qt} AS query_norm,
  {nt} AS node_type,
  {flt} AS filter_norm
FROM stitched
WHERE regexp_matches(content, '{rx}')
ORDER BY pid, seq
"""


# Hard cap on fixpoint iterations — JSON nesting is finite, so this only
# guards against a traversal bug, never legitimate data.
_MAX_PLAN_DEPTH = 100


def plan_normalize(spark: SparkSession) -> DataFrame:
    """U6: flattened plan nodes with normalized expression fields, to
    UNBOUNDED depth (normalize.go:129-242 recurses arbitrarily).

    Iterates the parse to a fixpoint instead of a fixed-depth schema: each
    node's ``Plans`` array is parsed as ``array<string>`` — Spark's JSON
    parser captures non-string values targeted at StringType as their raw
    JSON text — then posexploded into child rows, level by level, until a
    level is empty. The number of Spark jobs equals the actual max plan
    depth in the data; each level is a pure JVM projection."""
    from collector_spark.functions.fingerprint import normalize_query

    root = spark.table("query_samples").select(
        "sample_id", F.col("plan_json").alias("node"), F.lit("").alias("path")
    )
    levels = [root]
    frontier = root
    for _ in range(_MAX_PLAN_DEPTH):
        frontier = (
            frontier.select(
                "sample_id",
                "path",
                F.posexplode(
                    F.from_json(F.get_json_object("node", "$.Plans"), "array<string>")
                ).alias("i", "child"),
            )
            .select(
                "sample_id",
                F.col("child").alias("node"),
                F.concat(
                    F.when(F.col("path") == "", F.lit("")).otherwise(
                        F.concat(F.col("path"), F.lit("."))
                    ),
                    F.lit("Plans["),
                    F.col("i").cast("string"),
                    F.lit("]"),
                ).alias("path"),
            )
        )
        if frontier.isEmpty():
            break
        levels.append(frontier)
    else:
        raise RuntimeError(f"plan nesting exceeds {_MAX_PLAN_DEPTH} levels")

    nodes = levels[0]
    for lvl in levels[1:]:
        nodes = nodes.unionByName(lvl)

    def g(field: str):
        return F.get_json_object("node", f"$['{field}']")

    return (
        nodes.select(
            "sample_id",
            "path",
            g("Node Type").alias("node_type"),
            normalize_query(g("Filter")).alias("filter_norm"),
            normalize_query(g("Hash Cond")).alias("hash_cond_norm"),
            normalize_query(g("Index Cond")).alias("index_cond_norm"),
            F.array_join(
                F.transform(
                    F.from_json(g("Output"), "array<string>"), normalize_query
                ),
                ",",
            ).alias("output_norm"),
        )
        .filter(F.col("node_type").isNotNull())
        .orderBy("sample_id", "path")
    )


def oracle_plan_normalize() -> str:
    """Unbounded-depth oracle: a DuckDB recursive CTE walks the same tree
    with the same path labels (nested in a subquery so the fixture-CTE
    prelude can still merge its own WITH chain)."""
    from collector_spark.functions.fingerprint import oracle_normalize

    nt = "json_extract_string(node, '$.\"Node Type\"')"
    flt = oracle_normalize("json_extract_string(node, '$.Filter')")
    hc = oracle_normalize("json_extract_string(node, '$.\"Hash Cond\"')")
    ic = oracle_normalize("json_extract_string(node, '$.\"Index Cond\"')")
    out = (
        "array_to_string(list_transform("
        "CAST(json_extract(node, '$.Output') AS VARCHAR[]),"
        f" x -> {oracle_normalize('x')}), ',')"
    )
    return f"""
SELECT * FROM (
  WITH RECURSIVE nodes AS (
    SELECT sample_id, CAST('' AS VARCHAR) AS path, CAST(plan_json AS JSON) AS node
    FROM query_samples
    UNION ALL
    SELECT sample_id,
      CASE WHEN path = '' THEN '' ELSE path || '.' END
        || 'Plans[' || CAST(i AS VARCHAR) || ']',
      json_extract(node, '$.Plans[' || CAST(i AS VARCHAR) || ']')
    FROM (
      SELECT n.sample_id, n.path, n.node,
        unnest(range(CAST(COALESCE(
          json_array_length(json_extract(n.node, '$.Plans')), 0) AS BIGINT))) AS i
      FROM nodes n
    ) u
  )
  SELECT sample_id, path,
    {nt} AS node_type,
    {flt} AS filter_norm,
    {hc} AS hash_cond_norm,
    {ic} AS index_cond_norm,
    {out} AS output_norm
  FROM nodes
) q
WHERE node_type IS NOT NULL
ORDER BY sample_id, path
"""


# ---------------------------------------------------------------------------
# U5b — query samples as OTel-style trace spans (tracing.go:19-104): the
# reference's sink-side span export, re-expressed as a relational projection
# so a cluster pipeline can hand the rows to any OTLP forwarder.
# ---------------------------------------------------------------------------

# neutral stand-in for the configured app URL (tracing.go serverUrl param)
SERVER_URL = "https://pganalyze.local"
SPAN_NAME = "EXPLAIN Plan"  # tracing.go:19

# tracestate member logic (tracing.go:37-59): take the 'pganalyze' vendor
# value, split on ';', use the part keyed 't' as the client-side send time
_TRACESTATE_T_RE = r"pganalyze=(?:[^;]*;)*?\s*t:([0-9.]+)"


def trace_spans(spark: SparkSession) -> DataFrame:
    """One span per EXPLAIN-bearing sample whose tags carry a W3C
    traceparent (tracing.go:69-95): trace/parent-span ids from the
    traceparent, timing from the pganalyze tracestate 't' member when
    present (client send time + runtime) else occurred_at - runtime, and
    the sample deep-link URL (tracing.go:21-34) with the 64-bit fingerprint
    hex-encoded. Times are epoch microseconds (exact integers on both
    engines)."""
    from collector_spark.functions.fingerprint import fingerprint

    tags = comment_tags(spark)
    tp = tags.filter(F.col("tag_key") == "traceparent").select(
        "sample_id", F.col("tag_value").alias("traceparent")
    )
    ts = tags.filter(F.col("tag_key") == "tracestate").select(
        "sample_id", F.col("tag_value").alias("tracestate")
    )
    s = spark.table("query_samples").filter(F.col("plan_json").isNotNull())
    j = s.join(tp, "sample_id").join(ts, "sample_id", "left")

    t_sec = F.regexp_extract(F.coalesce("tracestate", F.lit("")), _TRACESTATE_T_RE, 1)
    has_t = t_sec != ""
    client_start_us = F.round(t_sec.cast("double") * 1_000_000).cast("long")
    start_us = F.when(has_t, client_start_us).otherwise(
        (F.col("occurred_at_unix") - F.lit(0)) * 1_000_000 - F.col("runtime_ms") * 1_000
    )
    end_us = F.when(has_t, client_start_us + F.col("runtime_ms") * 1_000).otherwise(
        F.col("occurred_at_unix") * 1_000_000
    )
    fp_hex = F.lower(F.lpad(F.hex(fingerprint(F.col("query_text"))), 16, "0"))
    url = F.concat(
        F.lit(SERVER_URL + "/databases/"),
        F.col("database_name"),
        F.lit("/queries/"),
        fp_hex,
        F.lit("/samples/"),
        F.col("occurred_at_unix").cast("string"),
        F.lit("?role="),
        F.col("username"),
    )
    return j.select(
        "sample_id",
        F.substring("traceparent", 4, 32).alias("trace_id"),
        F.substring("traceparent", 37, 16).alias("parent_span_id"),
        F.lit(SPAN_NAME).alias("span_name"),
        start_us.cast("long").alias("start_us"),
        end_us.cast("long").alias("end_us"),
        F.lit("postgresql").alias("db_system"),
        url.alias("plan_url"),
    ).orderBy("sample_id")


def oracle_trace_spans() -> str:
    from collector_spark.functions.fingerprint import oracle_fingerprint

    trx = _TRACESTATE_T_RE.replace("'", "''")
    tags = oracle_comment_tags()
    t_sec = f"regexp_extract(COALESCE(ts.tracestate, ''), '{trx}', 1)"
    start_client = f"CAST(round(CAST({t_sec} AS DOUBLE) * 1000000) AS BIGINT)"
    fp_hex = f"lpad(lower(hex({oracle_fingerprint('s.query_text')})), 16, '0')"
    return f"""
WITH tags AS ({tags}),
tp AS (SELECT sample_id, tag_value AS traceparent FROM tags WHERE tag_key = 'traceparent'),
ts AS (SELECT sample_id, tag_value AS tracestate FROM tags WHERE tag_key = 'tracestate')
SELECT s.sample_id,
  substr(tp.traceparent, 4, 32) AS trace_id,
  substr(tp.traceparent, 37, 16) AS parent_span_id,
  '{SPAN_NAME}' AS span_name,
  CASE WHEN {t_sec} <> '' THEN {start_client}
       ELSE s.occurred_at_unix * 1000000 - s.runtime_ms * 1000 END AS start_us,
  CASE WHEN {t_sec} <> '' THEN {start_client} + s.runtime_ms * 1000
       ELSE s.occurred_at_unix * 1000000 END AS end_us,
  'postgresql' AS db_system,
  '{SERVER_URL}/databases/' || s.database_name || '/queries/' || {fp_hex}
    || '/samples/' || CAST(s.occurred_at_unix AS VARCHAR) || '?role=' || s.username
    AS plan_url
FROM query_samples s
JOIN tp ON s.sample_id = tp.sample_id
LEFT JOIN ts ON s.sample_id = ts.sample_id
WHERE s.plan_json IS NOT NULL
ORDER BY s.sample_id
"""


# ---------------------------------------------------------------------------
# U5 full-contract tag parsing (tags.go:14-77 + tags_test.go goldens):
# multiple comments with later-keys-win conflict resolution, string
# literals skipped (a '/* ... */' inside a quoted string is not a
# comment), backslash-escaped quotes in sqlcommenter keys/values, full
# URL decode. The string-skip uses alternation-order consumption — the
# pattern matches string literals first WITHOUT capturing, so only real
# comments yield a non-empty group (identical leftmost-first semantics in
# Java regex and RE2).
# ---------------------------------------------------------------------------

_COMMENT_SCAN_RE = r"'[^']*'|/\*(.*?)\*/"


def _unescape_quotes(col):
    return F.regexp_replace(col, r"\\'", "'")


def comment_tags_full(spark: SparkSession) -> DataFrame:
    return _comment_tags_full_from(spark.table("query_samples"))


def _comment_tags_full_from(samples: DataFrame) -> DataFrame:
    comments = samples.select(
        "sample_id",
        F.posexplode(
            F.regexp_extract_all(
                F.col("query_text"), F.lit(_COMMENT_SCAN_RE), F.lit(1)
            )
        ).alias("c_idx", "comment"),
    ).filter(F.trim("comment") != "")
    parts = comments.select(
        "sample_id",
        "c_idx",
        F.posexplode(F.split(F.col("comment"), ",")).alias("p_idx", "raw_part"),
    ).select(
        "sample_id", "c_idx", "p_idx", F.trim(F.col("raw_part")).alias("part")
    )

    key_eq = F.trim(F.regexp_extract("part", r"^([^=]*)=(.*)$", 1))
    val_eq = F.trim(F.regexp_extract("part", r"^([^=]*)=(.*)$", 2))
    is_sqlc = F.col("part").rlike("^[^=]*=") & ~key_eq.contains(":")
    is_marg = F.col("part").contains(":")

    unquoted = F.regexp_replace(val_eq, r"^'(.*)'$", "$1")
    key = F.when(is_sqlc, F.url_decode(_unescape_quotes(key_eq))).otherwise(
        F.trim(F.regexp_extract("part", r"^([^:]*):(.*)$", 1))
    )
    val = F.when(is_sqlc, F.url_decode(_unescape_quotes(unquoted))).otherwise(
        F.trim(F.regexp_extract("part", r"^([^:]*):(.*)$", 2))
    )
    tagged = parts.filter((F.col("part") != "") & (is_sqlc | is_marg)).select(
        "sample_id",
        "c_idx",
        "p_idx",
        key.alias("tag_key"),
        val.alias("tag_value"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("sample_id", "tag_key").orderBy(
        F.desc("c_idx"), F.desc("p_idx")
    )
    return (
        tagged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("sample_id", "tag_key", "tag_value")
        .orderBy("sample_id", "tag_key")
    )


def oracle_comment_tags_full() -> str:
    scan = _COMMENT_SCAN_RE.replace("'", "''")
    key_dec = _oracle_urldecode(
        "regexp_replace(trim(regexp_extract(part, '^([^=]*)=(.*)$', 1)),"
        " '\\\\''', '''', 'g')"
    )
    val_dec = _oracle_urldecode(
        "regexp_replace(regexp_replace(trim(regexp_extract(part, '^([^=]*)=(.*)$', 2)),"
        " '^''(.*)''$', '\\1'), '\\\\''', '''', 'g')"
    )
    return rf"""
WITH comments AS (
  SELECT sample_id, c.c_idx, trim(c.comment) AS comment
  FROM query_samples,
  LATERAL (
    SELECT UNNEST(regexp_extract_all(query_text, '{scan}', 1)) AS comment,
           generate_subscripts(regexp_extract_all(query_text, '{scan}', 1), 1) AS c_idx
  ) c
  WHERE trim(c.comment) <> ''
),
parts AS (
  SELECT sample_id, c_idx, p.p_idx, trim(p.raw_part) AS part
  FROM comments,
  LATERAL (
    SELECT UNNEST(string_split(comment, ',')) AS raw_part,
           generate_subscripts(string_split(comment, ','), 1) AS p_idx
  ) p
),
typed AS (
  SELECT sample_id, c_idx, p_idx, part,
    regexp_matches(part, '^[^=]*=')
      AND NOT contains(trim(regexp_extract(part, '^([^=]*)=(.*)$', 1)), ':') AS is_sqlc,
    contains(part, ':') AS is_marg
  FROM parts WHERE part <> ''
),
tagged AS (
  SELECT sample_id, c_idx, p_idx,
    CASE WHEN is_sqlc THEN {key_dec}
         ELSE trim(regexp_extract(part, '^([^:]*):(.*)$', 1)) END AS tag_key,
    CASE WHEN is_sqlc THEN {val_dec}
         ELSE trim(regexp_extract(part, '^([^:]*):(.*)$', 2)) END AS tag_value
  FROM typed WHERE is_sqlc OR is_marg
),
resolved AS (
  SELECT *, row_number() OVER (PARTITION BY sample_id, tag_key
                               ORDER BY c_idx DESC, p_idx DESC) AS rn
  FROM tagged
)
SELECT sample_id, tag_key, tag_value FROM resolved WHERE rn = 1
ORDER BY sample_id, tag_key
"""


# ---------------------------------------------------------------------------
# U6 full field vector (normalize.go:181-232): every expression field the
# reference normalizes, in long form — one row per (node, field) with a
# non-null normalized value. Workers arrays recurse exactly like Plans
# (normalize.go:212-217). Grouping Sets (nested array-of-array group keys)
# are the one omitted family — declared, not silently dropped.
# ---------------------------------------------------------------------------

_NORM_SCALARS = (
    "Cache Key", "Conflict Filter", "Filter", "Function Call", "Hash Cond",
    "Index Cond", "Join Filter", "Merge Cond", "One-Time Filter", "Order By",
    "Recheck Cond", "Repeatable Seed", "Table Function Call", "TID Cond",
)
_NORM_ARRAYS = ("Group Key", "Output", "Presorted Key",
                "Sampling Parameters", "Sort Key")


def plan_normalize_full(spark: SparkSession) -> DataFrame:
    from collector_spark.functions.fingerprint import normalize_query

    root = spark.table("query_samples").select(
        "sample_id", F.col("plan_json").alias("node"), F.lit("").alias("path")
    )

    def children(df: DataFrame, key: str) -> DataFrame:
        return (
            df.select(
                "sample_id",
                "path",
                F.posexplode(
                    F.from_json(
                        F.get_json_object("node", f"$['{key}']"), "array<string>"
                    )
                ).alias("i", "child"),
            )
            .select(
                "sample_id",
                F.col("child").alias("node"),
                F.concat(
                    F.when(F.col("path") == "", F.lit("")).otherwise(
                        F.concat(F.col("path"), F.lit("."))
                    ),
                    F.lit(f"{key}["),
                    F.col("i").cast("string"),
                    F.lit("]"),
                ).alias("path"),
            )
        )

    levels = [root]
    frontier = root
    for _ in range(_MAX_PLAN_DEPTH):
        frontier = children(frontier, "Plans").unionByName(
            children(frontier, "Workers")
        )
        if frontier.isEmpty():
            break
        levels.append(frontier)
    else:
        raise RuntimeError(f"plan nesting exceeds {_MAX_PLAN_DEPTH} levels")

    nodes = levels[0]
    for lvl in levels[1:]:
        nodes = nodes.unionByName(lvl)

    def g(field: str):
        return F.get_json_object("node", f"$['{field}']")

    entries = [
        F.struct(F.lit(f).alias("field"), normalize_query(g(f)).alias("value"))
        for f in _NORM_SCALARS
    ] + [
        F.struct(
            F.lit(f).alias("field"),
            F.array_join(
                F.transform(F.from_json(g(f), "array<string>"), normalize_query),
                ",",
            ).alias("value"),
        )
        for f in _NORM_ARRAYS
    ]
    flat = (
        nodes.select(
            "sample_id",
            "path",
            F.get_json_object("node", "$['Node Type']").alias("node_type"),
            F.explode(F.array(*entries)).alias("e"),
        )
        .filter(F.col("e.value").isNotNull())
        .select(
            "sample_id",
            "path",
            "node_type",
            F.col("e.field").alias("field"),
            F.col("e.value").alias("value_norm"),
        )
    )

    # Grouping Sets (normalize.go:165-179): each set carries Group Keys /
    # Hash Keys (arrays OF arrays — one inner array per grouping) and an
    # optional Sort Key array
    def norm_join(arr_json):
        return F.array_join(
            F.transform(F.from_json(arr_json, "array<string>"), normalize_query), ","
        )

    gsets = nodes.select(
        "sample_id",
        F.get_json_object("node", "$['Node Type']").alias("node_type"),
        "path",
        F.posexplode(
            F.from_json(
                F.get_json_object("node", "$['Grouping Sets']"), "array<string>"
            )
        ).alias("gi", "gset"),
    ).select(
        "sample_id",
        "node_type",
        F.concat(
            F.col("path"),
            F.when(F.col("path") == "", F.lit("")).otherwise(F.lit(".")),
            F.lit("Grouping Sets["),
            F.col("gi").cast("string"),
            F.lit("]"),
        ).alias("path"),
        F.col("gset"),
    )
    gs_sort = gsets.select(
        "sample_id",
        "path",
        "node_type",
        F.lit("Sort Key").alias("field"),
        norm_join(F.get_json_object("gset", "$['Sort Key']")).alias("value_norm"),
    ).filter(F.col("value_norm").isNotNull())

    def keyed(kind: str) -> DataFrame:
        return (
            gsets.select(
                "sample_id",
                "path",
                "node_type",
                F.posexplode(
                    F.from_json(
                        F.get_json_object("gset", f"$['{kind}']"), "array<string>"
                    )
                ).alias("ki", "inner"),
            )
            .select(
                "sample_id",
                F.concat(
                    F.col("path"), F.lit(f".{kind}["), F.col("ki").cast("string"),
                    F.lit("]"),
                ).alias("path"),
                "node_type",
                F.lit(kind).alias("field"),
                norm_join(F.col("inner")).alias("value_norm"),
            )
            .filter(F.col("value_norm").isNotNull())
        )

    return (
        flat.unionByName(gs_sort)
        .unionByName(keyed("Group Keys"))
        .unionByName(keyed("Hash Keys"))
        .orderBy("sample_id", "path", "field")
    )


def oracle_plan_normalize_full() -> str:
    from collector_spark.functions.fingerprint import oracle_normalize

    def scalar(f: str) -> str:
        raw = f"json_extract_string(node, '$.\"{f}\"')"
        return (
            f"SELECT sample_id, path, node_type, '{f}' AS field,"
            f" {oracle_normalize(raw)} AS value_norm FROM n WHERE {raw} IS NOT NULL"
        )

    def arr(f: str) -> str:
        raw = f"CAST(json_extract(node, '$.\"{f}\"') AS VARCHAR[])"
        val = (
            f"array_to_string(list_transform({raw}, x -> {oracle_normalize('x')}), ',')"
        )
        return (
            f"SELECT sample_id, path, node_type, '{f}' AS field,"
            f" {val} AS value_norm FROM n WHERE {raw} IS NOT NULL"
        )

    gs_base = (
        "SELECT sample_id,"
        " path || CASE WHEN path = '' THEN '' ELSE '.' END"
        " || 'Grouping Sets[' || CAST(gi AS VARCHAR) || ']' AS path,"
        " node_type,"
        " json_extract(node, '$.\"Grouping Sets\"[' || CAST(gi AS VARCHAR) || ']') AS gset"
        " FROM (SELECT n.*, unnest(range(CAST(COALESCE(json_array_length("
        "json_extract(n.node, '$.\"Grouping Sets\"')), 0) AS BIGINT))) AS gi FROM n) g"
    )
    gs_sort_val = (
        "array_to_string(list_transform(CAST(json_extract(gset, '$.\"Sort Key\"')"
        f" AS VARCHAR[]), x -> {oracle_normalize('x')}), ',')"
    )
    gs_sort = (
        f"SELECT sample_id, path, node_type, 'Sort Key' AS field,"
        f" {gs_sort_val} AS value_norm FROM gs"
        f" WHERE json_extract(gset, '$.\"Sort Key\"') IS NOT NULL"
    )

    def gs_keys(kind: str) -> str:
        inner = (
            f"CAST(json_extract(gset, '$.\"{kind}\"[' || CAST(ki AS VARCHAR) || ']')"
            " AS VARCHAR[])"
        )
        val = (
            f"array_to_string(list_transform({inner}, x -> {oracle_normalize('x')}), ',')"
        )
        return (
            f"SELECT sample_id,"
            f" path || '.{kind}[' || CAST(ki AS VARCHAR) || ']' AS path,"
            f" node_type, '{kind}' AS field, {val} AS value_norm"
            f" FROM (SELECT gs.*, unnest(range(CAST(COALESCE(json_array_length("
            f"json_extract(gset, '$.\"{kind}\"')), 0) AS BIGINT))) AS ki FROM gs) k"
        )

    branches = "\nUNION ALL\n".join(
        [scalar(f) for f in _NORM_SCALARS]
        + [arr(f) for f in _NORM_ARRAYS]
        + [gs_sort, gs_keys("Group Keys"), gs_keys("Hash Keys")]
    )
    return f"""
SELECT * FROM (
  WITH RECURSIVE nodes AS (
    SELECT sample_id, CAST('' AS VARCHAR) AS path, CAST(plan_json AS JSON) AS node
    FROM query_samples
    UNION ALL
    SELECT sample_id,
      CASE WHEN path = '' THEN '' ELSE path || '.' END
        || key || '[' || CAST(i AS VARCHAR) || ']',
      json_extract(node, '$.' || key || '[' || CAST(i AS VARCHAR) || ']')
    FROM (
      SELECT n.sample_id, n.path, n.node, k.key,
        unnest(range(CAST(COALESCE(
          json_array_length(json_extract(n.node, '$.' || k.key)), 0) AS BIGINT))) AS i
      FROM nodes n, (VALUES ('Plans'), ('Workers')) k(key)
    ) u
  ),
  n AS (
    SELECT sample_id, path,
      json_extract_string(node, '$."Node Type"') AS node_type, node
    FROM nodes
  ),
  gs AS ({gs_base})
  SELECT sample_id, path, node_type, field, value_norm
  FROM ({branches})
)
ORDER BY sample_id, path, field
"""
