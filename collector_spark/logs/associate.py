"""W4/J8 — secondary-line association (logs/analyze.go:2248-2294).

STATEMENT/DETAIL/HINT/CONTEXT/QUERY lines attach to the nearest preceding
primary line of the same pid, at most 4 rows back (the reference scans <= 4
lines ahead from each primary — the inverse view of the same relation).

Spark shape: one window over (pid, seq) — a sequence as-of join, no
self-join needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from collector_spark.logs.stitch import stitch_lines

SECONDARY_LEVELS = ("DETAIL", "HINT", "CONTEXT", "STATEMENT", "QUERY")
LOOKAHEAD = 4


def associate_secondaries(spark: SparkSession) -> DataFrame:
    return associate_df(stitch_lines(spark))


def associate_df(lines: DataFrame) -> DataFrame:
    """Associate a stitched-lines-shaped frame — parametric so composed
    consumers (the compact-log snapshot fact) reuse one stitched relation
    instead of re-deriving the parse+stitch subtree per stage."""
    is_secondary = F.col("log_level").isin(*SECONDARY_LEVELS)
    w = (
        Window.partitionBy("pid")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_rn = lines.withColumn(
        "rn", F.row_number().over(Window.partitionBy("pid").orderBy("seq"))
    )
    prim_seq = F.max(F.when(~is_secondary, F.col("seq"))).over(w)
    prim_rn = F.max(F.when(~is_secondary, F.col("rn"))).over(w)
    out = (
        with_rn.withColumn("primary_seq", prim_seq)
        .withColumn("primary_rn", prim_rn)
        .filter(
            is_secondary
            & F.col("primary_rn").isNotNull()
            & ((F.col("rn") - F.col("primary_rn")) <= LOOKAHEAD)
        )
        .select(
            "pid",
            "primary_seq",
            F.col("seq").alias("secondary_seq"),
            F.col("log_level").alias("secondary_level"),
            F.col("content").alias("secondary_content"),
        )
    )
    return out


def associate_secondaries_q(spark: SparkSession) -> DataFrame:
    return associate_secondaries(spark).orderBy("pid", "secondary_seq")


def oracle_associate(stitched_cte: str) -> str:
    levels = ", ".join(f"'{lv}'" for lv in SECONDARY_LEVELS)
    return f"""
WITH stitched AS ({stitched_cte}),
numbered AS (
  SELECT *, row_number() OVER (PARTITION BY pid ORDER BY seq) AS rn
  FROM stitched
),
tagged AS (
  SELECT *,
    MAX(CASE WHEN log_level NOT IN ({levels}) THEN seq END)
      OVER (PARTITION BY pid ORDER BY seq ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS primary_seq,
    MAX(CASE WHEN log_level NOT IN ({levels}) THEN rn END)
      OVER (PARTITION BY pid ORDER BY seq ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS primary_rn
  FROM numbered
)
SELECT pid, primary_seq, seq AS secondary_seq,
       log_level AS secondary_level, content AS secondary_content
FROM tagged
WHERE log_level IN ({levels})
  AND primary_rn IS NOT NULL AND rn - primary_rn <= {LOOKAHEAD}
ORDER BY pid, secondary_seq
"""


# ---------------------------------------------------------------------------
# Secondary-line detail extraction (analyze.go:51,1177): DETAIL parameter
# lines explode into (param_idx, param_value) rows; NULL parameters keep a
# SQL NULL value, mirroring the reference's (NULL)|'value' alternation.
# ---------------------------------------------------------------------------

_PARAM_IDX_RE = r"[$]([0-9]+) = (?:NULL|'[^']*')"
_PARAM_VAL_RE = r"[$][0-9]+ = (NULL|'[^']*')"


def parameter_details(spark: SparkSession) -> DataFrame:
    """U7 secondary depth: one row per bound parameter on DETAIL lines."""
    sec = associate_secondaries(spark).filter(
        (F.col("secondary_level") == "DETAIL")
        & F.col("secondary_content").startswith("parameters: ")
    )
    idxs = F.regexp_extract_all("secondary_content", F.lit(_PARAM_IDX_RE), 1)
    vals = F.regexp_extract_all("secondary_content", F.lit(_PARAM_VAL_RE), 1)
    pairs = F.arrays_zip(idxs.alias("i"), vals.alias("v"))
    e = sec.select(
        "pid", "primary_seq", "secondary_seq", F.explode(pairs).alias("p")
    )
    raw_val = F.col("p.v")
    return (
        e.select(
            "pid",
            "primary_seq",
            "secondary_seq",
            F.col("p.i").cast("int").alias("param_idx"),
            F.when(raw_val == "NULL", F.lit(None).cast("string"))
            .otherwise(F.regexp_replace(raw_val, r"^'(.*)'$", "$1"))
            .alias("param_value"),
        )
        .orderBy("pid", "secondary_seq", "param_idx")
    )


def oracle_parameter_details(associated_cte: str) -> str:
    idx_re = _PARAM_IDX_RE.replace("'", "''")
    val_re = _PARAM_VAL_RE.replace("'", "''")
    return f"""
WITH assoc AS ({associated_cte}),
det AS (
  SELECT pid, primary_seq, secondary_seq,
    unnest(regexp_extract_all(secondary_content, '{idx_re}', 1)) AS i,
    unnest(regexp_extract_all(secondary_content, '{val_re}', 1)) AS v
  FROM assoc
  WHERE secondary_level = 'DETAIL' AND starts_with(secondary_content, 'parameters: ')
)
SELECT pid, primary_seq, secondary_seq,
  CAST(i AS INT) AS param_idx,
  CASE WHEN v = 'NULL' THEN NULL
       ELSE regexp_replace(v, '^''(.*)''$', '\\1') END AS param_value
FROM det
ORDER BY pid, secondary_seq, param_idx
"""
