"""Text -> vector bridge: feature-hashed TF document vectors and a
prefix-filtered cosine near-dup join over them.

Every embedding operator in ml/similarity.py consumes the synthetic
``embeddings`` table; this module closes the gap between raw text and
those operators with the classic hashing trick (Weinberger et al. 2009,
"Feature Hashing for Large Scale Multitask Learning"): tokens hash into a
fixed TF_DIM-dimensional count vector, kept in LONG FORM (doc_id, dim, tf)
so every downstream consumer is a plain relational join — no array column,
no UDF, and the dot product of two documents is an integer SUM over an
equi-join on ``dim``.

The near-dup join uses PREFIX FILTERING (Bayardo et al. 2007, "Scaling Up
All Pairs Similarity Search" / Chaudhuri et al. 2006): a candidate pair
must share one of each document's PREFIX_P *rarest* live dimensions —
rare dims produce small blocking buckets, and dims that appear in more
than half the corpus ("stop dims") are excluded from blocking entirely
(they carry no discriminative signal and would form corpus-sized
buckets). Verification is exact and engine-portable: the integer
cross-multiplied form   dot^2 * 25 >= 16 * |a|^2 * |b|^2   decides
cosine >= 0.8 without a float threshold edge; the reported cosine double
is derived from the same three integers on both engines.

Scale design (100 TB): the TF relation is one explode + one
groupBy(doc_id, dim); the dim-frequency and rarity relations are bounded
by TF_DIM (256 rows — broadcast); blocking reuses dedup's
_pairs_from_buckets with its LSH_BUCKET_CAP expansion bound, and the
canonical-first discipline (vectors only for exact-dup canonicals) keeps
duplicate floods out of the buckets exactly as in MinHash LSH
(ml/dedup.py:52). Verification joins touch candidate pairs only. The one
driver-visible scalar (the stop-dim threshold's corpus count) is computed
relationally via a broadcast 1-row crossJoin, not a .count().

Integer-overflow envelope: dot <= sqrt(na * nb) and the verify compare is
dot^2 * 25, exact while na * nb * 25 < 2^63 — i.e. per-doc squared norms
up to ~6e8 (hundreds of thousands of token occurrences per document). A
100 TB deployment with pathological single documents beyond that would
move the compare to DECIMAL(38,0); fixture and web-scale documents sit
far inside the envelope.

Reference parity: no counterpart in pganalyze/collector (this is the
training-data mandate surface, like ml/dedup.py); the hashing-trick and
all-pairs designs are from the cited public papers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from collector_spark.ml.dedup import (
    LSH_BUCKET_CAP,
    _exact_canonicals,
    _hash60,
    _pairs_from_buckets,
    _SQL_CANON,
    _sql_hash60,
)

TF_DIM = 256          # hashed vector width
PREFIX_P = 2          # rarest live dims used as blocking keys per doc
NEARDUP_COS_NUM = 16  # cosine >= 0.8  <=>  dot^2 * 25 >= 16 * na * nb
NEARDUP_COS_DEN = 25
_TOK_RE = "[a-z0-9]+"


def _tf_long(docs: DataFrame) -> DataFrame:
    """(doc_id, dim, tf): the hashed term-frequency vector in long form.
    One explode + one groupBy; token -> dim is the md5-60bit hash mod
    TF_DIM (the engine-portable hash used by every dedup stage)."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(_TOK_RE), 0)
        ).alias("tok"),
    )
    return (
        toks.select(
            "doc_id", (_hash60(F.col("tok")) % TF_DIM).cast("int").alias("dim")
        )
        .groupBy("doc_id", "dim")
        .agg(F.count("*").cast("long").alias("tf"))
    )


_SQL_TF = f"""
SELECT doc_id, CAST(({_sql_hash60('tok')}) % {TF_DIM} AS INT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS tf
FROM (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{_TOK_RE}')) AS tok
  FROM {{src}}
) t
GROUP BY doc_id, dim
"""


def hashed_tf_vectors(spark: SparkSession, docs: DataFrame | None = None) -> DataFrame:
    """E100 — the registered vector relation: every document's hashed TF
    vector plus its squared L2 norm (an integer, so downstream cosine math
    stays engine-exact). Long form IS the output contract — dense arrays
    would force a 256-slot transform per row for no consumer benefit."""
    docs = spark.table("documents") if docs is None else docs
    tf = _tf_long(docs)
    w = Window.partitionBy("doc_id")
    return (
        tf.withColumn(
            "norm_sq", F.sum(F.col("tf") * F.col("tf")).over(w).cast("long")
        )
        .select("doc_id", "dim", "tf", "norm_sq")
        .orderBy("doc_id", "dim")
    )


def oracle_hashed_tf_vectors() -> str:
    return f"""
WITH tf AS ({_SQL_TF.format(src='documents')})
SELECT doc_id, dim, tf,
       CAST(SUM(tf * tf) OVER (PARTITION BY doc_id) AS BIGINT) AS norm_sq
FROM tf
ORDER BY doc_id, dim
"""


def hashed_tf_neardup(spark: SparkSession, docs: DataFrame | None = None) -> DataFrame:
    """E101 — cosine near-dup pairs (>= 0.8) over the hashed TF vectors,
    prefix-filter blocked. Canonical-first: vectors are built only for
    exact-dup canonicals, so identical-content floods contribute zero
    pairs here (they are already decided by ml_exact_dup), mirroring the
    MinHash LSH discipline. A pair is REACHABLE iff some dim is among BOTH
    docs' PREFIX_P rarest live dims and that dim's bucket is within
    LSH_BUCKET_CAP; reachable pairs are verified with exact integer
    math. The TF relation feeds five consumers, so it is materialized once
    (lazy localCheckpoint — the codebase's shared-stage idiom).
    """
    docs = spark.table("documents") if docs is None else docs
    canon = _exact_canonicals(docs)
    tf = _tf_long(canon).localCheckpoint(eager=False)
    norms = tf.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("norm_sq")
    )
    # document frequency per dim ((doc_id, dim) is unique in tf) and
    # the corpus size, both relational; a dim is "live" (usable for
    # blocking) while it appears in at most half the canonical corpus
    dfreq = tf.groupBy("dim").agg(F.count("*").cast("long").alias("df"))
    ndocs = canon.agg(F.count("*").cast("long").alias("n_docs"))
    live = (
        dfreq.crossJoin(F.broadcast(ndocs))
        .filter(F.col("df") * 2 <= F.col("n_docs"))
        # injective rarity key: (df asc, dim asc) without a window
        .select("dim", (F.col("df") * TF_DIM + F.col("dim")).alias("rar"))
    )
    wd = Window.partitionBy("doc_id").orderBy(F.asc("rar"))
    prefix = (
        tf.join(F.broadcast(live), "dim")
        .withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") <= PREFIX_P)
        .select("doc_id", F.col("dim").cast("string").alias("bucket"))
    )
    pairs = _pairs_from_buckets(prefix)
    ta = tf.select(F.col("doc_id").alias("doc_a"), "dim", F.col("tf").alias("tf_a"))
    tb = tf.select(F.col("doc_id").alias("doc_b"), "dim", F.col("tf").alias("tf_b"))
    dots = (
        pairs.join(ta, "doc_a")
        .join(tb, ["doc_b", "dim"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("tf_a") * F.col("tf_b")).cast("long").alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("norm_sq").alias("norm_a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("norm_sq").alias("norm_b"))
    out = (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(
            F.col("dot") * F.col("dot") * NEARDUP_COS_DEN
            >= F.lit(NEARDUP_COS_NUM) * F.col("norm_a") * F.col("norm_b")
        )
        .select(
            "doc_a",
            "doc_b",
            "dot",
            "norm_a",
            "norm_b",
            (
                F.col("dot").cast("double")
                / F.sqrt(F.col("norm_a").cast("double") * F.col("norm_b").cast("double"))
            ).alias("cosine"),
        )
        .orderBy("doc_a", "doc_b")
    )
    return out


def oracle_hashed_tf_neardup() -> str:
    return f"""
WITH canon AS ({_SQL_CANON}),
tf AS ({_SQL_TF.format(src='canon')}),
norms AS (
  SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS norm_sq FROM tf GROUP BY doc_id
),
dfreq AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY dim),
ndocs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM canon),
live AS (
  SELECT dim, df * {TF_DIM} + dim AS rar
  FROM dfreq CROSS JOIN ndocs WHERE df * 2 <= n_docs
),
prefix AS (
  SELECT doc_id, CAST(dim AS VARCHAR) AS bucket
  FROM (
    SELECT tf.doc_id, tf.dim,
           row_number() OVER (PARTITION BY tf.doc_id ORDER BY live.rar ASC) AS rn
    FROM tf JOIN live USING (dim)
  ) p WHERE rn <= {PREFIX_P}
),
buckets AS (
  SELECT bucket, list_sort(list(doc_id)) AS ids
  FROM prefix GROUP BY bucket
  HAVING COUNT(*) > 1 AND COUNT(*) <= {LSH_BUCKET_CAP}
),
pairs AS (
  SELECT DISTINCT ids[CAST(i AS INT)] AS doc_a, ids[CAST(j AS INT)] AS doc_b
  FROM buckets,
       LATERAL (SELECT unnest(range(1, len(ids) + 1)) AS i) gi,
       LATERAL (SELECT unnest(range(1, len(ids) + 1)) AS j) gj
  WHERE i < j
),
dots AS (
  SELECT p.doc_a, p.doc_b, CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
  FROM pairs p
  JOIN tf a ON a.doc_id = p.doc_a
  JOIN tf b ON b.doc_id = p.doc_b AND b.dim = a.dim
  GROUP BY p.doc_a, p.doc_b
)
SELECT d.doc_a, d.doc_b, d.dot,
       na.norm_sq AS norm_a, nb.norm_sq AS norm_b,
       CAST(d.dot AS DOUBLE)
         / sqrt(CAST(na.norm_sq AS DOUBLE) * CAST(nb.norm_sq AS DOUBLE)) AS cosine
FROM dots d
JOIN norms na ON na.doc_id = d.doc_a
JOIN norms nb ON nb.doc_id = d.doc_b
WHERE d.dot * d.dot * {NEARDUP_COS_DEN} >= {NEARDUP_COS_NUM} * na.norm_sq * nb.norm_sq
ORDER BY d.doc_a, d.doc_b
"""
