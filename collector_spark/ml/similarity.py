"""Similarity search over the embeddings table (array<float>, 64 dims).

  brute-force cosine top-k — the correctness baseline: query set x corpus,
      JVM-side fold for the dot product, row_number window for top-k.
  LSH-bucketed ANN — the scale path: sign-bit hyperplane bucketing (here:
      the first HP dims' signs), candidates only within the query's bucket.

Scale design: brute force is O(|Q| x |C|) — fine for small query sets
because the corpus side stays distributed and the query side broadcasts.
The LSH variant bounds the join to bucket-mates (expected corpus/2^HP per
bucket); at 100 TB this is the difference between a full cross join and a
bucket-equi join. An IVF variant would substitute k-means centroids for
sign bits — same join shape.

Float-determinism contract with the oracle: cast float->double (exact),
then a strictly sequential left fold for dot/norm (Spark ``aggregate`` ==
DuckDB ``list_reduce``), so both engines produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

N_QUERIES = 5   # vec_id < 5 are the query set
TOP_K = 10
HP = 8          # hyperplane sign bits for LSH bucketing


def _fold_dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(_fold_dot(a, a))


def brute_force_topk(spark: SparkSession) -> DataFrame:
    emb = spark.table("embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    corpus = emb.select(F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("cv"))
    # broadcast the tiny query side; corpus stays distributed
    joined = corpus.crossJoin(F.broadcast(queries)).filter(
        F.col("query_id") != F.col("corpus_id")
    )
    cosine = (_fold_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias(
        "cosine"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        joined.select("query_id", "corpus_id", cosine)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


_SQL_DOT = (
    "list_reduce(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
)


def _sql_dot(a: str, b: str) -> str:
    return _SQL_DOT.format(a=a, b=b)


def oracle_brute_force_topk() -> str:
    dot = _sql_dot("q.embedding", "c.embedding")
    qq = _sql_dot("q.embedding", "q.embedding")
    cc = _sql_dot("c.embedding", "c.embedding")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         ({dot}) / (sqrt({qq}) * sqrt({cc})) AS cosine
  FROM embeddings q, embeddings c
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
)
SELECT query_id, corpus_id, cosine,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS INT) AS rank
FROM scored
QUALIFY rank <= {TOP_K}
ORDER BY query_id, rank
"""


def _bucket(col: Column) -> Column:
    out = F.lit(0)
    for j in range(HP):
        out = out + F.when(F.element_at(col, j + 1) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out.cast("int")


def lsh_topk(spark: SparkSession) -> DataFrame:
    """ANN: candidates restricted to the query's sign-bit bucket."""
    emb = spark.table("embeddings").withColumn("bucket", _bucket(F.col("embedding")))
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "bucket"
    )
    corpus = emb.select(
        F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("cv"), "bucket"
    )
    joined = corpus.join(F.broadcast(queries), on="bucket").filter(
        F.col("query_id") != F.col("corpus_id")
    )
    cosine = (_fold_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))).alias(
        "cosine"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        joined.select("query_id", "corpus_id", cosine)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


def oracle_lsh_topk() -> str:
    bucket = " + ".join(
        f"CASE WHEN embedding[{j + 1}] > 0 THEN {1 << j} ELSE 0 END" for j in range(HP)
    )
    dot = _sql_dot("q.embedding", "c.embedding")
    qq = _sql_dot("q.embedding", "q.embedding")
    cc = _sql_dot("c.embedding", "c.embedding")
    return f"""
WITH b AS (SELECT vec_id, embedding, CAST({bucket} AS INT) AS bucket FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         ({dot}) / (sqrt({qq}) * sqrt({cc})) AS cosine
  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
  WHERE q.vec_id < {N_QUERIES}
)
SELECT query_id, corpus_id, cosine,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS INT) AS rank
FROM scored
QUALIFY rank <= {TOP_K}
ORDER BY query_id, rank
"""
