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
      with the U2 constant-erasure. The reference recurses unbounded; the
      engine parses with a bounded-depth from_json schema (SURVEY §1.1) and
      flattens node rows with posexplode, so everything stays JVM-side and
      oracle-checkable. Depth is a config knob: real auto_explain plans
      nest deeper — raise the schema depth or fall back to a pandas UDF for
      pathological trees.

Scale: both are pure per-row projections (no shuffle, codegen-friendly);
the plan explode multiplies rows by node count only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

_COMMENT_RE = r"/\*(.+?)\*/"


def _decode(col):
    # sqlcommenter URL-decode subset exercised by the fixture
    return F.replace(
        F.replace(col, F.lit("%20"), F.lit(" ")), F.lit("%27"), F.lit("'")
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
    return r"""
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
    THEN replace(replace(trim(regexp_extract(part, '^([^=]*)=(.*)$', 1)), '%20', ' '), '%27', '''')
    ELSE trim(regexp_extract(part, '^([^:]*):(.*)$', 1)) END AS tag_key,
  CASE WHEN is_sqlc
    THEN replace(replace(regexp_replace(trim(regexp_extract(part, '^([^=]*)=(.*)$', 2)), '^''(.*)''$', '\1'), '%20', ' '), '%27', '''')
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


# bounded-depth EXPLAIN plan schema (U6)
def _node_schema(depth: int) -> StructType:
    fields = [
        StructField("Node Type", StringType()),
        StructField("Filter", StringType()),
        StructField("Hash Cond", StringType()),
        StructField("Index Cond", StringType()),
        StructField("Output", ArrayType(StringType())),
    ]
    if depth > 1:
        fields.append(StructField("Plans", ArrayType(_node_schema(depth - 1))))
    return StructType(fields)


PLAN_SCHEMA = _node_schema(3)


def plan_normalize(spark: SparkSession) -> DataFrame:
    """U6: flattened plan nodes with normalized expression fields."""
    from collector_spark.functions.fingerprint import normalize_query

    q = spark.table("query_samples").withColumn(
        "plan", F.from_json("plan_json", PLAN_SCHEMA)
    )

    def node_row(df, node, path):
        return df.select(
            "sample_id",
            path.alias("path"),
            node["Node Type"].alias("node_type"),
            normalize_query(node["Filter"]).alias("filter_norm"),
            normalize_query(node["Hash Cond"]).alias("hash_cond_norm"),
            normalize_query(node["Index Cond"]).alias("index_cond_norm"),
            F.array_join(
                F.transform(node["Output"], normalize_query), ","
            ).alias("output_norm"),
        )

    root = node_row(q, F.col("plan"), F.lit(""))
    l2 = q.select(
        "sample_id", F.posexplode(F.col("plan")["Plans"]).alias("i", "node")
    )
    level2 = node_row(
        l2, F.col("node"), F.concat(F.lit("Plans["), F.col("i").cast("string"), F.lit("]"))
    )
    l3 = l2.select(
        "sample_id",
        "i",
        F.posexplode(F.col("node")["Plans"]).alias("j", "node3"),
    )
    level3 = node_row(
        l3,
        F.col("node3"),
        F.concat(
            F.lit("Plans["),
            F.col("i").cast("string"),
            F.lit("].Plans["),
            F.col("j").cast("string"),
            F.lit("]"),
        ),
    )
    return (
        root.unionByName(level2)
        .unionByName(level3)
        .filter(F.col("node_type").isNotNull())
        .orderBy("sample_id", "path")
    )


def oracle_plan_normalize() -> str:
    from collector_spark.functions.fingerprint import oracle_normalize

    def sel(path_sql_prefix: str, path_label: str) -> str:
        nt = f"json_extract_string(plan_json, '$.{path_sql_prefix}\"Node Type\"')"
        flt = oracle_normalize(
            f"json_extract_string(plan_json, '$.{path_sql_prefix}Filter')"
        )
        hc = oracle_normalize(
            f'json_extract_string(plan_json, \'$.{path_sql_prefix}"Hash Cond"\')'
        )
        ic = oracle_normalize(
            f'json_extract_string(plan_json, \'$.{path_sql_prefix}"Index Cond"\')'
        )
        out = (
            "array_to_string(list_transform("
            f"CAST(json_extract(plan_json, '$.{path_sql_prefix}Output') AS VARCHAR[]),"
            f" x -> {oracle_normalize('x')}), ',')"
        )
        return (
            f"SELECT sample_id, '{path_label}' AS path, {nt} AS node_type,"
            f" {flt} AS filter_norm, {hc} AS hash_cond_norm, {ic} AS index_cond_norm,"
            f" {out} AS output_norm FROM query_samples"
        )

    selects = " UNION ALL ".join(
        [
            sel("", ""),
            sel("Plans[0].", "Plans[0]"),
            sel("Plans[1].", "Plans[1]"),
            sel("Plans[2].", "Plans[2]"),
            sel("Plans[0].Plans[0].", "Plans[0].Plans[0]"),
            sel("Plans[0].Plans[1].", "Plans[0].Plans[1]"),
            sel("Plans[0].Plans[2].", "Plans[0].Plans[2]"),
        ]
    )
    return f"""
SELECT * FROM ({selects}) q
WHERE node_type IS NOT NULL
ORDER BY sample_id, path
"""
