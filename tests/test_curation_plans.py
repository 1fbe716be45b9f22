"""Scale contract proofs for the curation operators: the plan shapes that
keep them viable at 100 TB, pinned so a refactor can't silently regress
them (same idea as test_bucketed_diff.py)."""

from __future__ import annotations


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_decontaminate_broadcasts_eval_grams(prepared_spark):
    """The corpus-side n-gram explode must never shuffle: the tiny eval
    n-gram set is the broadcast side of the contamination join."""
    from collector_spark.ml.curation import decontaminate

    plan = _plan(decontaminate(prepared_spark))
    assert "BroadcastHashJoin" in plan, plan
    # the exploded corpus grams appear only under broadcast joins — the only
    # hash exchanges are the per-doc count-distinct pair (partial distinct +
    # final agg) and the distinct over the (tiny) eval split
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_stratified_sample_window_is_partitioned(prepared_spark):
    """The quota ranking must partition by the stratum key — a global
    single-partition window would serialize the corpus through one task."""
    from collector_spark.ml.curation import stratified_sample

    plan = _plan(stratified_sample(prepared_spark))
    assert "Exchange hashpartitioning(lang" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_tfidf_uses_partial_top_k(prepared_spark):
    """row_number + rank<=k must compile to WindowGroupLimit (map-side
    partial top-k before the shuffle), not a full per-source sort of every
    (source, term) pair on the reduce side only."""
    from collector_spark.ml.curation import tfidf_top_terms

    plan = _plan(tfidf_top_terms(prepared_spark))
    assert "WindowGroupLimit" in plan, plan
    assert "Partial" in plan.split("WindowGroupLimit", 2)[-1] or plan.count(
        "WindowGroupLimit"
    ) >= 2, plan
