"""Curated-corpus parquet exporter — the SINK stage of the training-data
pipeline: compose the dedup (E29) and quality (E43) keep-lists, shard the
surviving documents into size-targeted parquet files partitioned by
source, and publish the manifest a downstream training job consumes.

Two faces:

- ``export_manifest`` (registered as ``ml_export_manifest``) is the PURE
  relational plan of the export: per source the kept doc/char volume and
  the planned shard count under EXPORT_MAX_RECORDS — DuckDB-oracle-checked
  like every other query.
- ``export_corpus`` performs the real write (an action, so never
  registered): repartitionByRange over (source, doc_id) onto the planned
  shard count, sortWithinPartitions so every file carries a contiguous
  doc_id range (parquet min/max pruning works on read-back),
  ``partitionBy(source)`` for partition-pruned consumption, and
  ``maxRecordsPerFile`` as the hard per-file cap. Returns the read-back
  audit. The write path is test-pinned against the manifest
  (tests/test_r10_additions.py): exact per-source row totals, per-file
  cap honored, actual file count within the range-straddle bound of the
  plan.

Scale notes: the only driver-side action in ``export_corpus`` is
collecting the per-source manifest (O(sources) rows) to size the range
partitioner — the same bounded collect a production writer does to pick
its shard count. Everything else is one range shuffle of the kept corpus.
At 100 TB, EXPORT_MAX_RECORDS becomes the rows-per-~1 GB-shard target and
the range exchange is the job's single full shuffle; the keep-list joins
upstream stay doc_id-partitioned (see dedup_keep_list's notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# fixture-scale shard target; production sets rows-per-target-shard-size
EXPORT_MAX_RECORDS = 500


def curated_docs(spark: SparkSession) -> DataFrame:
    """Documents surviving BOTH the dedup and the quality cut — the
    corpus the export ships. Plain doc_id equi-joins of total-over-corpus
    relations (never broadcast; see dedup_keep_list)."""
    from collector_spark.ml.curation import quality_keep_list
    from collector_spark.ml.dedup import dedup_keep_list

    dk = dedup_keep_list(spark).select("doc_id", F.col("keep").alias("dedup_keep"))
    qk = quality_keep_list(spark).select(
        "doc_id", F.col("keep").alias("quality_keep")
    )
    return (
        spark.table("documents")
        .join(dk, "doc_id")
        .join(qk, "doc_id")
        .filter(F.col("dedup_keep") & F.col("quality_keep"))
        .drop("dedup_keep", "quality_keep")
    )


def export_manifest(spark: SparkSession) -> DataFrame:
    """Per-source export plan: kept docs, kept chars, planned shard count
    under EXPORT_MAX_RECORDS (ceil division, exact integer math)."""
    return _manifest_of(curated_docs(spark))


def _manifest_of(kept: DataFrame) -> DataFrame:
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
        .select(
            "source",
            "n_docs",
            "n_chars",
            F.ceil(F.col("n_docs") / F.lit(float(EXPORT_MAX_RECORDS)))
            .cast("long")
            .alias("n_shards"),
        )
        .orderBy("source")
    )


def oracle_export_manifest() -> str:
    from collector_spark.ml.curation import oracle_quality_keep_list
    from collector_spark.ml.dedup import oracle_dedup_keep_list

    dk = oracle_dedup_keep_list().rsplit("ORDER BY", 1)[0]
    qk = oracle_quality_keep_list().rsplit("ORDER BY", 1)[0]
    return f"""
WITH dk_full AS ({dk}),
qk_full AS ({qk})
SELECT d.source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(d.n_chars) AS BIGINT) AS n_chars,
  CAST(CEIL(COUNT(*) / {float(EXPORT_MAX_RECORDS)}) AS BIGINT) AS n_shards
FROM documents d
JOIN dk_full k ON k.doc_id = d.doc_id
JOIN qk_full q ON q.doc_id = d.doc_id
WHERE k.keep AND q.keep
GROUP BY d.source
ORDER BY d.source
"""


def export_corpus(
    spark: SparkSession,
    out_dir: str,
    max_records: int = EXPORT_MAX_RECORDS,
) -> DataFrame:
    """Write the curated corpus as source-partitioned, size-capped,
    doc_id-clustered parquet shards; return the read-back per-source
    audit (rows + files actually produced).

    The curated corpus is materialized ONCE (lazy localCheckpoint) and
    feeds BOTH the manifest collect that sizes the range partitioner and
    the write itself — without it the dedup + quality keep-list joins
    (the expensive half of the pipeline) execute twice per export run
    (r11; measured ~2x on the bench headliner)."""
    kept = curated_docs(spark).localCheckpoint(eager=False)
    plan = _manifest_of(kept).collect()  # O(sources) — sizes the range
    n_parts = max(1, sum(r["n_shards"] for r in plan))
    (
        kept.repartitionByRange(n_parts, "source", "doc_id")
        .sortWithinPartitions("source", "doc_id")
        .write.mode("overwrite")
        .partitionBy("source")
        .option("maxRecordsPerFile", max_records)
        .parquet(out_dir)
    )
    back = spark.read.parquet(out_dir).withColumn("_file", F.input_file_name())
    return (
        back.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count_distinct("_file").cast("long").alias("n_files"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# E127 — corpus snapshot diff: the release report between two export
# versions (what a 100 TB pipeline publishes alongside every refresh —
# which documents were added, removed, or content-changed, per source).
# The two versions are deterministic projections of the fixture corpus:
# v1 (previous) drops doc_id % 11 == 0; v2 (current) drops
# doc_id % 7 == 0 and rewrites text for doc_id % 19 == 0 (reverse —
# engine-portable), so all four statuses occur. Status is decided by a
# FULL OUTER equi-join on doc_id with a row-local text compare.
#
# Scale: one shuffle on doc_id (at 100 TB both snapshots live as
# doc_id-bucketed export tables, making the join shuffle-free); the
# report groupBy is bounded at sources x 4 statuses. The text compare
# rides the join row — for multi-MB documents a content-hash column
# materialized at export time replaces it (same plan, narrower shuffle).
# ---------------------------------------------------------------------------

DIFF_PREV_MOD = 11   # v1 excludes doc_id % 11 == 0
DIFF_CURR_MOD = 7    # v2 excludes doc_id % 7 == 0
DIFF_EDIT_MOD = 19   # v2 rewrites text for doc_id % 19 == 0


def corpus_diff(spark: SparkSession, docs: DataFrame | None = None) -> DataFrame:
    docs = spark.table("documents") if docs is None else docs
    v1 = docs.filter(F.col("doc_id") % DIFF_PREV_MOD != 0).select(
        "doc_id", F.col("source").alias("src1"), F.col("text").alias("text1")
    )
    v2 = docs.filter(F.col("doc_id") % DIFF_CURR_MOD != 0).select(
        "doc_id",
        F.col("source").alias("src2"),
        F.when(
            F.col("doc_id") % DIFF_EDIT_MOD == 0, F.reverse(F.col("text"))
        ).otherwise(F.col("text")).alias("text2"),
    )
    status = (
        F.when(F.col("text1").isNull(), F.lit("added"))
        .when(F.col("text2").isNull(), F.lit("removed"))
        .when(F.col("text1") != F.col("text2"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        v1.join(v2, "doc_id", "full")
        .select(
            F.coalesce("src2", "src1").alias("source"),
            status.alias("status"),
            F.length(F.coalesce("text2", "text1")).cast("long").alias("chars"),
        )
        .groupBy("source", "status")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("chars").cast("long").alias("n_chars"),
        )
        .orderBy("source", "status")
    )


def oracle_corpus_diff() -> str:
    return f"""
WITH v1 AS (
  SELECT doc_id, source AS src1, text AS text1
  FROM documents WHERE doc_id % {DIFF_PREV_MOD} != 0
),
v2 AS (
  SELECT doc_id, source AS src2,
    CASE WHEN doc_id % {DIFF_EDIT_MOD} = 0 THEN reverse(text) ELSE text END AS text2
  FROM documents WHERE doc_id % {DIFF_CURR_MOD} != 0
),
j AS (
  SELECT COALESCE(v2.src2, v1.src1) AS source,
    CASE WHEN v1.text1 IS NULL THEN 'added'
         WHEN v2.text2 IS NULL THEN 'removed'
         WHEN v1.text1 != v2.text2 THEN 'changed'
         ELSE 'unchanged' END AS status,
    CAST(length(COALESCE(v2.text2, v1.text1)) AS BIGINT) AS chars
  FROM v1 FULL OUTER JOIN v2 USING (doc_id)
)
SELECT source, status, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(chars) AS BIGINT) AS n_chars
FROM j GROUP BY source, status ORDER BY source, status
"""


# ---------------------------------------------------------------------------
# E129 — corpus validation report (the Deequ-style release gate a 100 TB
# pipeline runs before handing a corpus to training): a fixed constraint
# suite over the documents table, one row per constraint with exact
# violation counts. Row-local constraints fold in ONE combinable
# aggregate pass; the uniqueness constraint is the only shuffle (one
# distinct on doc_id). The report is O(constraints) rows regardless of
# corpus size.
# ---------------------------------------------------------------------------

_VALIDATE_ROW_CHECKS: list[tuple[str, str]] = [
    # (constraint name, SQL boolean expr that is TRUE when VIOLATED —
    # shared verbatim by the Spark plan and the DuckDB oracle)
    ("doc_id_not_null", "doc_id IS NULL"),
    ("doc_id_non_negative", "doc_id IS NOT NULL AND doc_id < 0"),
    ("text_not_empty", "text IS NULL OR length(text) = 0"),
    ("n_chars_matches_text", "n_chars IS NULL OR text IS NULL OR n_chars != length(text)"),
    ("n_chars_positive", "n_chars IS NULL OR n_chars <= 0"),
    # lowercase-two-letter check without regex (the expr strings are shared
    # VERBATIM by both engines and their regex functions differ): each of
    # the two characters individually in ['a','z'] — uppercase and digit
    # bytes both sort below 'a'. (A whole-string BETWEEN 'aa' AND 'zz'
    # does NOT work: lexicographic order decides at the first differing
    # character, so 'e9' sits between 'aa' and 'zz'.)
    (
        "lang_is_iso2",
        "lang IS NULL OR length(lang) != 2 "
        "OR substring(lang, 1, 1) NOT BETWEEN 'a' AND 'z' "
        "OR substring(lang, 2, 1) NOT BETWEEN 'a' AND 'z'",
    ),
    ("source_not_null", "source IS NULL OR length(source) = 0"),
]


def corpus_validate(spark: SparkSession, docs: DataFrame | None = None) -> DataFrame:
    docs = spark.table("documents") if docs is None else docs
    aggs = [
        F.sum(F.expr(expr).cast("long")).alias(name)
        for name, expr in _VALIDATE_ROW_CHECKS
    ]
    row_counts = docs.agg(F.count(F.lit(1)).cast("long").alias("n_checked"), *aggs)
    uniq = docs.agg(
        (
            F.count("doc_id") - F.countDistinct("doc_id")
        ).cast("long").alias("doc_id_unique")
    )
    return validate_report(row_counts.crossJoin(F.broadcast(uniq)))


def validate_report(base: DataFrame) -> DataFrame:
    """Unpivot the 1-row counts relation (n_checked + one column per
    constraint) into the (constraint_name, n_checked, n_violations,
    passed) report — shared by the batch operator and the ST twin (which
    folds its streamed per-doc count state into the same 1-row shape)."""
    names = [n for n, _ in _VALIDATE_ROW_CHECKS] + ["doc_id_unique"]
    stack = ", ".join(f"'{n}', {n}" for n in names)
    long = base.selectExpr(
        "n_checked",
        f"stack({len(names)}, {stack}) AS (constraint_name, n_violations)",
    )
    return long.select(
        "constraint_name",
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("constraint_name")


def oracle_corpus_validate() -> str:
    checks = ", ".join(
        f"CAST(SUM(CASE WHEN {expr} THEN 1 ELSE 0 END) AS BIGINT) AS {name}"
        for name, expr in _VALIDATE_ROW_CHECKS
    )
    names = [n for n, _ in _VALIDATE_ROW_CHECKS] + ["doc_id_unique"]
    unions = " UNION ALL ".join(
        f"SELECT '{n}' AS constraint_name, n_checked, {n} AS n_violations FROM base"
        for n in names
    )
    return f"""
WITH agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_checked, {checks},
    CAST(COUNT(doc_id) - COUNT(DISTINCT doc_id) AS BIGINT) AS doc_id_unique
  FROM documents
),
base AS (SELECT * FROM agg)
SELECT constraint_name, n_checked, n_violations, n_violations = 0 AS passed
FROM ({unions}) u
ORDER BY constraint_name
"""
