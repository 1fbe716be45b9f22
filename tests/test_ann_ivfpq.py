"""E75 IVF-PQ invariants: candidates come only from probed lists (so its
recall can never exceed exact IVF's), and the rerank stage is exact — every
returned cosine equals the brute-force cosine for that pair."""

from pyspark.sql import functions as F


def test_ivfpq_candidates_subset_of_probed_lists(prepared_spark):
    from collector_spark.ml.similarity import ann_recall

    rec = (
        ann_recall(prepared_spark)
        .groupBy("method")
        .agg(F.avg("recall").alias("r"))
        .collect()
    )
    by = {row.method: row.r for row in rec}
    assert by["ivf_pq"] <= by["ivf"] + 1e-12, by


def test_ivfpq_rerank_cosines_are_exact(prepared_spark):
    from collector_spark.ml.similarity import brute_force_topk, ivf_pq_topk

    got = ivf_pq_topk(prepared_spark).select("query_id", "corpus_id", "cosine")
    # brute force ranks all pairs; join on the pair and compare the cosine
    # computed over raw floats vs the rerank's grid-quantized vectors —
    # they must agree to the quantization tolerance (2^-20 per component)
    truth_all = brute_force_topk(prepared_spark).select(
        "query_id", "corpus_id", F.col("cosine").alias("bf_cosine")
    )
    joined = got.join(truth_all, ["query_id", "corpus_id"]).select(
        (F.abs(F.col("cosine") - F.col("bf_cosine"))).alias("err")
    )
    rows = joined.collect()
    if rows:  # only pairs that made brute-force top-k are comparable
        assert max(r.err for r in rows) < 1e-4, max(r.err for r in rows)
