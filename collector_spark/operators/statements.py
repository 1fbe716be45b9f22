"""Statement-statistics pipeline — the collector's flagship computation.

Covers SURVEY.md §2 operators:
  A1  counter diff per key           (state/postgres_statement.go:65-83)
  J2  new-vs-previous snapshot join  (runner/diff.go:38-74)
  ST7 counter-reset re-seed          (input/postgres/statements.go:78-126)
  P8  zero-call delta filter         (input/full_1min.go:81-84)
  J1  stats-to-texts join w/ unavailable fallback
                                     (output/transform/postgres_statements.go:17-26)
  P6  collector-query filter         (input/postgres/statements.go:70-72)
  A2  roll-up by fingerprint w/ contributing query_ids
                                     (output/transform/postgres_statements.go:13-55)

Shapes over the F1/F2 fixtures (collector_spark.fixtures.defs). Both the
Spark plan and the DuckDB oracle SQL are generated from the same column
lists below, so they cannot drift.

Scale notes: the diff is one key-partitioned join (see core.diff); the text
join is a second join on the same 4-column key — at scale, repartitioning
the diff output once by key and reusing that partitioning for the text join
avoids a second full shuffle. The rollup is a partial-aggregatable groupBy
(map-side combine) on a lower-cardinality key (fingerprints << query_ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collector_spark.core.diff import diff_counters, oracle_diff_sql
from collector_spark.functions.fingerprint import (
    FP_UNAVAILABLE,
    fingerprint,
    is_collector_query,
    normalize_query,
    oracle_fingerprint,
    oracle_normalize,
)

KEYS = ["database_oid", "user_oid", "query_id", "toplevel"]
COUNTERS = [
    "calls",
    "total_time",
    "rows",
    "shared_blks_hit",
    "shared_blks_read",
    "shared_blks_dirtied",
    "shared_blks_written",
    "local_blks_hit",
    "local_blks_read",
    "local_blks_dirtied",
    "local_blks_written",
    "temp_blks_read",
    "temp_blks_written",
    "blk_read_time",
    "blk_write_time",
]
# exact-decimal counters (cast to DOUBLE only at query output)
DECIMALS = {"total_time", "blk_read_time", "blk_write_time"}


def statement_diff(spark: SparkSession) -> DataFrame:
    """A1/J2/ST7/P8: per-key deltas of snap2 against snap1 (decimal-exact)."""
    cur = spark.table("stmt_snap2")
    prev = spark.table("stmt_snap1")
    d = diff_counters(cur, prev, KEYS, COUNTERS, reset_col="calls")
    return d.filter(F.col("calls") > 0)


def statement_diff_q(spark: SparkSession) -> DataFrame:
    """Query-facing variant: decimals rendered as DOUBLE."""
    d = statement_diff(spark)
    cols = [F.col(k) for k in KEYS] + [
        (F.col(c).cast("double") if c in DECIMALS else F.col(c)).alias(c) for c in COUNTERS
    ]
    return d.select(*cols).orderBy(*KEYS)


def statement_rollup(spark: SparkSession) -> DataFrame:
    """J1/P6/A2: join texts, fingerprint, roll up by fingerprint group."""
    d = statement_diff(spark)
    texts = spark.table("stmt_texts")
    # texts has the same cardinality as the stats fact (one text per key,
    # up to 250 MB/server: input/postgres/statements.go:215-275) — never
    # force-broadcast it. The diff output is already hash-partitioned by
    # KEYS from its own join, so Catalyst reuses that exchange here and the
    # text join costs one shuffle of the texts side only; AQE may still
    # choose a broadcast at runtime when texts is genuinely small.
    # The fingerprint/normalize chain is ~10 regexp passes over the full
    # query text — by far the most expensive scalar work in the pipeline.
    # Many query_ids share one text (the rollup's whole point), so compute
    # it once per DISTINCT text and map back, instead of once per joined
    # row (r3 bench showed the per-row form regressing a2 by 43% after the
    # repair/IN-collapse passes were added; the distinct set is ~6x smaller
    # than the fact at every measured SF). The map-back join keys on the
    # text itself — at scale both sides hash-partition on query_text and
    # the distinct side is the post-aggregation (small) one.
    fp_lookup = (
        texts.select("query_text")
        .distinct()
        .select(
            "query_text",
            fingerprint(F.col("query_text")).alias("fingerprint"),
            normalize_query(F.col("query_text")).alias("normalized_query"),
        )
    )
    texts_fp = texts.join(fp_lookup, on="query_text", how="left")
    j = d.join(texts_fp, on=KEYS, how="left")
    j = j.filter(~F.coalesce(is_collector_query(F.col("query_text")), F.lit(False)))
    # rows with no text never hit the lookup: restore the sentinel group
    j = j.withColumn(
        "fingerprint", F.coalesce(F.col("fingerprint"), F.lit(FP_UNAVAILABLE))
    )
    group = ["database_oid", "user_oid", "fingerprint", "toplevel"]
    aggs = [
        (
            F.sum(c).cast("double") if c in DECIMALS else F.sum(c).cast("long")
        ).alias(c)
        for c in COUNTERS
    ] + [
        F.array_join(
            F.transform(F.sort_array(F.collect_set("query_id")), lambda x: x.cast("string")),
            ",",
        ).alias("query_ids"),
        F.min("normalized_query").alias("normalized_query"),
    ]
    return j.groupBy(*group).agg(*aggs).orderBy(*group)


def statements_scan(spark: SparkSession) -> DataFrame:
    """S1/S2: the raw pg_stat_statements scan with version-substituted
    columns (input/postgres/statements.go:22-44,:128-194): post-1.8 column
    names (total_exec_time), version-gated columns defaulted via
    COALESCE/lit (wal_records only on pg13+, toplevel only on 1.9+), and
    the text join (S2) with the unavailable sentinel."""
    s = spark.table("stmt_snap2")
    texts = spark.table("stmt_texts")
    j = s.join(texts, on=KEYS, how="left")
    return (
        j.select(
            "database_oid",
            "user_oid",
            "query_id",
            F.coalesce(F.col("toplevel"), F.lit(True)).alias("toplevel"),
            "calls",
            F.col("total_time").cast("double").alias("total_exec_time"),
            "rows",
            "shared_blks_hit",
            "shared_blks_read",
            F.lit(0).cast("long").alias("wal_records"),
            F.lit(0).cast("long").alias("wal_bytes"),
            F.coalesce(F.col("query_text"), F.lit("<unavailable>")).alias("query_text"),
        )
        .orderBy(*KEYS)
    )


def oracle_statements_scan() -> str:
    keys = ", ".join(KEYS)
    return f"""
SELECT s.database_oid, s.user_oid, s.query_id,
  COALESCE(s.toplevel, true) AS toplevel,
  s.calls, CAST(s.total_time AS DOUBLE) AS total_exec_time, s.rows,
  s.shared_blks_hit, s.shared_blks_read,
  CAST(0 AS BIGINT) AS wal_records, CAST(0 AS BIGINT) AS wal_bytes,
  COALESCE(t.query_text, '<unavailable>') AS query_text
FROM stmt_snap2 s LEFT JOIN stmt_texts t USING ({keys})
ORDER BY s.database_oid, s.user_oid, s.query_id, s.toplevel
"""


RESET_ENTRY_CAP = 2000        # pg_stat_statements.max analog
RESET_TEXT_BYTES_CAP = 100_000  # reference: 250 MB text-file cap


def reset_decision(spark: SparkSession) -> DataFrame:
    """ST7 trigger side (input/postgres/statements.go:78-110): reset when
    entries reach 90% of pg_stat_statements.max or accumulated query-text
    bytes exceed the cap; emits the measured values and the winning
    reason per database."""
    entries = (
        spark.table("stmt_snap2")
        .groupBy("database_oid")
        .agg(F.count("*").cast("long").alias("entries"))
    )
    text_bytes = (
        spark.table("stmt_texts")
        .groupBy("database_oid")
        .agg(F.sum(F.length("query_text")).cast("long").alias("text_bytes"))
    )
    j = entries.join(text_bytes, on="database_oid", how="left")
    by_entries = F.col("entries") >= F.lit(int(0.9 * RESET_ENTRY_CAP))
    by_bytes = F.coalesce(F.col("text_bytes"), F.lit(0)) > RESET_TEXT_BYTES_CAP
    return (
        j.select(
            "database_oid",
            "entries",
            F.coalesce(F.col("text_bytes"), F.lit(0)).alias("text_bytes"),
            (by_entries | by_bytes).alias("needs_reset"),
            F.when(by_entries, F.lit("entries"))
            .when(by_bytes, F.lit("text_bytes"))
            .otherwise(F.lit("none"))
            .alias("reason"),
        )
        .orderBy("database_oid")
    )


def oracle_reset_decision() -> str:
    threshold = int(0.9 * RESET_ENTRY_CAP)
    return f"""
WITH e AS (
  SELECT database_oid, CAST(COUNT(*) AS BIGINT) AS entries
  FROM stmt_snap2 GROUP BY database_oid
),
t AS (
  SELECT database_oid, CAST(SUM(length(query_text)) AS BIGINT) AS text_bytes
  FROM stmt_texts GROUP BY database_oid
)
SELECT e.database_oid, e.entries, COALESCE(t.text_bytes, 0) AS text_bytes,
  e.entries >= {threshold} OR COALESCE(t.text_bytes, 0) > {RESET_TEXT_BYTES_CAP} AS needs_reset,
  CASE WHEN e.entries >= {threshold} THEN 'entries'
       WHEN COALESCE(t.text_bytes, 0) > {RESET_TEXT_BYTES_CAP} THEN 'text_bytes'
       ELSE 'none' END AS reason
FROM e LEFT JOIN t USING (database_oid)
ORDER BY e.database_oid
"""


UNMONITORED_DBS = (4,)  # fixture analog of skipping unmonitored databases


def explain_skip(spark: SparkSession) -> DataFrame:
    """P11: compound EXPLAIN skip predicate (input/postgres/explain.go:21-31):
    drop samples from unmonitored databases, collector queries, privilege
    sentinels, and backup commands."""
    t = spark.table("stmt_texts")
    return (
        t.filter(
            ~F.col("database_oid").isin(*UNMONITORED_DBS)
            & ~is_collector_query(F.col("query_text"))
            & (F.col("query_text") != "<insufficient privilege>")
            & ~F.col("query_text").startswith("COPY ")
        )
        .select("database_oid", "user_oid", "query_id", "toplevel", "query_text")
        .orderBy("database_oid", "user_oid", "query_id", "toplevel")
    )


def oracle_explain_skip() -> str:
    dbs = ", ".join(str(d) for d in UNMONITORED_DBS)
    return f"""
SELECT database_oid, user_oid, query_id, toplevel, query_text
FROM stmt_texts
WHERE database_oid NOT IN ({dbs})
  AND NOT starts_with(query_text, '/* pganalyze-collector */')
  AND query_text <> '<insufficient privilege>'
  AND NOT starts_with(query_text, 'COPY ')
ORDER BY database_oid, user_oid, query_id, toplevel
"""


# ---------------------------------------------------------------------------
# DuckDB oracle SQL (generated from the same column lists)
# ---------------------------------------------------------------------------

def _diff_sql(render_double: bool) -> str:
    inner = oracle_diff_sql(
        "stmt_snap2",
        "stmt_snap1",
        KEYS,
        COUNTERS,
        reset_col="calls",
        double_cols=DECIMALS if render_double else frozenset(),
    )
    return f"SELECT * FROM ({inner}) dd WHERE calls > 0"


def oracle_statement_diff() -> str:
    keys = ", ".join(KEYS)
    return f"SELECT * FROM ({_diff_sql(render_double=True)}) d ORDER BY {keys}"


def oracle_statement_rollup() -> str:
    sums = ", ".join(
        f"CAST(SUM(d.{c}) AS {'DOUBLE' if c in DECIMALS else 'BIGINT'}) AS {c}" for c in COUNTERS
    )
    fp = oracle_fingerprint("t.query_text")
    norm = oracle_normalize("t.query_text")
    keys = ", ".join(KEYS)
    return f"""
WITH stmt_diff AS ({_diff_sql(render_double=False)})
SELECT d.database_oid, d.user_oid, {fp} AS fingerprint, d.toplevel,
  {sums},
  array_to_string(list_sort(list(DISTINCT d.query_id)), ',') AS query_ids,
  MIN({norm}) AS normalized_query
FROM stmt_diff d
LEFT JOIN stmt_texts t USING ({keys})
WHERE t.query_text IS NULL OR t.query_text NOT LIKE '/* pganalyze-collector */%'
GROUP BY d.database_oid, d.user_oid, {fp}, d.toplevel
ORDER BY d.database_oid, d.user_oid, fingerprint, d.toplevel
"""
