"""Training-data curation operators over the documents table.

  decontamination    — flag training docs that share word 8-grams with an
                       eval/benchmark split (train/test leakage removal)
  stratified sample  — deterministic per-stratum quota sampling for data
                       mixing (downsample over-represented lang×source
                       strata)
  tf-idf top terms   — distinctive-term extraction per source

These complete the curation story next to dedup (dedup.py), ANN
(similarity.py) and text stats (textstats.py): a reference-collector user
running an LLM data pipeline needs leak checks, mixing ratios and corpus
introspection in the same engine that dedups.

All built-in expressions — whole-stage codegen, zero Python in the row
path. Score arithmetic sticks to exactly-rounded IEEE ops (multiply /
divide on integer-valued doubles, no transcendentals), so the DuckDB
oracle matches bit-for-bit.

Scale notes (100 TB):
  * decontamination broadcasts only the DISTINCT eval n-gram set (eval
    benchmarks are tiny — MBs — next to a training corpus); the train-side
    n-gram explode streams map-side and the per-doc count is a combinable
    groupBy. No shuffle ever carries the exploded corpus n-grams.
  * the sampler's only shuffle is the per-stratum window, partitioned by
    the stratum key; skew is bounded by the largest stratum, and the hash
    ranking means a map-side top-K pre-filter can be layered in front
    without changing results.
  * tf-idf shuffles (source, term) pairs — combinable aggs both times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# word n-gram width for contamination checks (8 is the common published
# choice for benchmark decontamination)
NGRAM_N = 8
# the deterministic "benchmark" split of the fixture corpus: the documents
# table has no eval flag, so the smallest source id plays the eval set
EVAL_SOURCE = "src0"
# per-stratum quota for the mixing sampler
STRATUM_QUOTA = 5
# Knuth multiplicative hash constants (public-domain); doc_id is folded to
# 31 bits first so the product stays inside signed-64 exactly in both
# engines
_HASH_MULT = 2654435761
_HASH_FOLD = 2147483648  # 2^31
_HASH_MOD = 4294967296  # 2^32


def _word_ngrams(tok_col: str, n: int):
    """All n-token windows of the token-array column as space-joined strings
    (empty when the doc has fewer than n tokens). References the already-
    materialized token column so the split happens once per row."""
    return F.when(
        F.size(F.col(tok_col)) >= n,
        F.expr(
            f"transform(sequence(1, size({tok_col}) - {n - 1}), "
            f"i -> concat_ws(' ', slice({tok_col}, i, {n})))"
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(spark: SparkSession) -> DataFrame:
    """Benchmark decontamination: for every training document (source !=
    EVAL_SOURCE), count how many distinct word 8-grams also occur anywhere
    in the eval split, and flag any overlap as contamination.

    The eval n-gram set is DISTINCT'ed then broadcast — the right plan at
    scale, where the benchmark is orders of magnitude smaller than the
    corpus being screened.
    """
    docs = spark.table("documents")
    grams = docs.select(
        "doc_id", "source", F.split(F.col("text"), " ").alias("t")
    ).select("doc_id", "source", F.explode(_word_ngrams("t", NGRAM_N)).alias("gram"))
    eval_grams = (
        grams.filter(F.col("source") == EVAL_SOURCE).select("gram").distinct()
    )
    matched = (
        grams.filter(F.col("source") != EVAL_SOURCE)
        .join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("matched_grams"))
    )
    return (
        docs.filter(F.col("source") != EVAL_SOURCE)
        .select("doc_id", "source")
        .join(matched, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce(F.col("matched_grams"), F.lit(0).cast("long")).alias(
                "matched_grams"
            ),
            (F.coalesce(F.col("matched_grams"), F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


def oracle_decontaminate() -> str:
    n = NGRAM_N
    return f"""
WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id, source,
         unnest(list_transform(generate_series(1, len(t) - {n - 1}),
                               i -> array_to_string(t[i:i+{n - 1}], ' '))) AS gram
  FROM toks WHERE len(t) >= {n}
),
eval_grams AS (SELECT DISTINCT gram FROM grams WHERE source = '{EVAL_SOURCE}'),
m AS (
  SELECT g.doc_id, COUNT(DISTINCT g.gram) AS matched_grams
  FROM grams g JOIN eval_grams e USING (gram)
  WHERE g.source <> '{EVAL_SOURCE}'
  GROUP BY g.doc_id
)
SELECT d.doc_id, d.source,
       COALESCE(m.matched_grams, 0) AS matched_grams,
       COALESCE(m.matched_grams, 0) > 0 AS contaminated
FROM documents d LEFT JOIN m USING (doc_id)
WHERE d.source <> '{EVAL_SOURCE}'
ORDER BY d.doc_id
"""


def stratified_sample(spark: SparkSession) -> DataFrame:
    """Deterministic quota sampling per (lang, source) stratum: rank every
    doc inside its stratum by a Knuth multiplicative hash of doc_id (a
    seedless, engine-portable shuffle order) and keep the first
    STRATUM_QUOTA. The decision is a pure function of doc_id, so re-runs
    and backfills select identical rows — the property a training-data
    mixing step needs.
    """
    docs = spark.table("documents")
    samp_hash = F.pmod(
        F.pmod(F.col("doc_id"), F.lit(_HASH_FOLD)) * F.lit(_HASH_MULT),
        F.lit(_HASH_MOD),
    ).cast("long")
    w = Window.partitionBy("lang", "source").orderBy("samp_hash", "doc_id")
    return (
        docs.select("doc_id", "lang", "source", samp_hash.alias("samp_hash"))
        .withColumn("stratum_rank", F.row_number().over(w))
        .withColumn("kept", F.col("stratum_rank") <= STRATUM_QUOTA)
        .orderBy("doc_id")
    )


def oracle_stratified_sample() -> str:
    return f"""
WITH s AS (
  SELECT doc_id, lang, source,
         ((doc_id % {_HASH_FOLD}) * {_HASH_MULT}) % {_HASH_MOD} AS samp_hash
  FROM documents
)
SELECT doc_id, lang, source, samp_hash,
       CAST(row_number() OVER (PARTITION BY lang, source ORDER BY samp_hash, doc_id)
            AS INTEGER) AS stratum_rank,
       CAST(row_number() OVER (PARTITION BY lang, source ORDER BY samp_hash, doc_id)
            AS INTEGER) <= {STRATUM_QUOTA} AS kept
FROM s ORDER BY doc_id
"""


def tfidf_top_terms(spark: SparkSession, k: int = 5) -> DataFrame:
    """Distinctive terms per source: tf-idf with idf = n_sources / df
    (no logarithm — division of integer-valued doubles is exactly rounded,
    keeping Spark and the oracle bit-identical), top-k per source with a
    (score desc, term asc) total order.
    """
    docs = spark.table("documents")
    terms = docs.select(
        "source", F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    )
    tf = terms.groupBy("source", "term").agg(F.count("*").alias("tf"))
    df_ = terms.groupBy("term").agg(F.countDistinct("source").alias("df"))
    n_sources = docs.select(
        F.countDistinct("source").cast("long").alias("n_sources")
    )
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_sources))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (F.col("n_sources").cast("double") / F.col("df").cast("double")),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select("source", "term", "tf", "df", "score", "term_rank")
        .orderBy("source", "term_rank")
    )


def oracle_tfidf_top_terms(k: int = 5) -> str:
    return f"""
WITH terms AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS term FROM documents
),
tf AS (SELECT source, term, COUNT(*) AS tf FROM terms GROUP BY source, term),
df AS (SELECT term, COUNT(DISTINCT source) AS df FROM terms GROUP BY term),
ns AS (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources FROM documents),
scored AS (
  SELECT tf.source, tf.term, tf.tf, df.df,
         CAST(tf.tf AS DOUBLE) * (CAST(ns.n_sources AS DOUBLE) / CAST(df.df AS DOUBLE)) AS score
  FROM tf JOIN df USING (term) CROSS JOIN ns
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY source ORDER BY score DESC, term ASC)
                 AS INTEGER) AS term_rank
  FROM scored
)
SELECT source, term, tf, df, score, term_rank
FROM ranked WHERE term_rank <= {k}
ORDER BY source, term_rank
"""
