"""Structural/property tests for the round-7 continuation operators:
BPE merge semantics, weighted sampling invariants, schema-collection
routing, and the plan-fact grouping contract. The value-exactness of each
operator is covered by the oracle sweep (test_registry_oracle); these pin
the SEMANTIC invariants an oracle diff alone would not explain."""

from __future__ import annotations

from pyspark.sql import functions as F

from collector_spark.registry import REGISTRY


def _run(prepared_spark, name):
    return REGISTRY[name].spark_fn(prepared_spark)


def test_bpe_merge_consumes_the_applied_pair(prepared_spark):
    """After applying merge (x, y), no round-2 adjacency of the single
    characters x and y may remain: literal leftmost-first replacement
    rewrites every non-overlapping occurrence, and replacements insert the
    merged symbol (no separator), so no new 'x y' adjacency can form."""
    rows = _run(prepared_spark, "ml_bpe_merge_round").collect()
    assert rows, "round-2 pair table empty"
    applied = rows[0]["applied_pair"]
    assert len(applied) == 2
    p1, p2 = applied[0], applied[1]
    leftovers = [r for r in rows if r["sym_a"] == p1 and r["sym_b"] == p2]
    assert leftovers == [], f"unmerged occurrences of {applied!r}: {leftovers}"
    # the merged symbol participates in round 2 as a unit
    assert any(
        r["sym_a"] == applied or r["sym_b"] == applied for r in rows
    ), "merged symbol never appears in round-2 pairs"


def test_bpe_round1_top_pair_matches_round2_applied(prepared_spark):
    top1 = _run(prepared_spark, "ml_bpe_pair_counts").collect()[0]
    applied = _run(prepared_spark, "ml_bpe_merge_round").collect()[0][
        "applied_pair"
    ]
    assert top1["pair"] == applied


def test_weighted_sample_rank_invariants(prepared_spark):
    """Per source: ranks are contiguous from 1, at most K rows, and the
    quantized keys are non-increasing in rank (the A-ES ordering)."""
    from collector_spark.ml.curation import WEIGHTED_SAMPLE_K

    rows = _run(prepared_spark, "ml_weighted_sample").collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    assert by_source
    for source, rs in by_source.items():
        rs.sort(key=lambda r: r["sample_rank"])
        assert [r["sample_rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= WEIGHTED_SAMPLE_K
        keys = [r["key_q"] for r in rs]
        assert keys == sorted(keys, reverse=True), f"{source}: keys not sorted"


def test_schema_workflow_timeout_is_a_suffix(prepared_spark):
    """Once one attempt crosses the deadline every later attempt is
    timeout_skipped — the reference stops the loop; only duplicate rows
    (which never consume attempt time) may interleave after it."""
    rows = (
        _run(prepared_spark, "j14_schema_collection_workflow")
        .orderBy("collect_order")
        .collect()
    )
    attempts = [r for r in rows if r["route"] != "duplicate"]
    seen_timeout = False
    for r in attempts:
        if r["route"] == "timeout_skipped":
            seen_timeout = True
        elif seen_timeout:
            raise AssertionError(
                f"non-timeout route {r['route']} after the deadline crossing"
            )
    assert seen_timeout, "fixture no longer exercises the deadline path"
    assert {r["route"] for r in rows} == {
        "collected",
        "error_skipped",
        "timeout_skipped",
        "duplicate",
    }


def test_plan_fact_groups_add_stats(prepared_spark):
    """The plan fact's calls must equal the per-(query_idx, plan_id) SUM
    over the keyed plan rows — the groupPlans add contract — and plan_idx
    must be dense."""
    fact = _run(prepared_spark, "snapshot_plan_fact")
    rows = fact.collect()
    assert rows
    idxs = sorted(r["plan_idx"] for r in rows)
    assert idxs == list(range(len(rows))), "plan_idx not dense"
    # every group collapses >= 1 source row and sums are positive
    assert all(r["calls"] > 0 for r in rows)
    # grouping actually collapses multiple statement keys per fingerprint
    # (the fixture maps hundreds of query_ids onto a handful of shapes),
    # and the summed calls are EXACTLY the keyed source total — the keyed
    # source being plan rows whose statement key survives into the rollup
    # (groupPlans drops absent-statement keys: collector-marker texts and
    # zero-delta-filtered statements)
    from collector_spark.operators.snapshot import _persisted_rollup

    total_calls = sum(r["calls"] for r in rows)
    keys = (
        _persisted_rollup(prepared_spark)
        .select(
            "database_oid",
            "user_oid",
            F.explode(F.split("query_ids", ",")).alias("qid"),
        )
        .filter(F.col("qid") != "")
        .select(
            "database_oid",
            "user_oid",
            F.col("qid").cast("long").alias("query_id"),
        )
        .distinct()
    )
    src = (
        prepared_spark.table("plan_rows")
        .filter(F.col("plan_type").isin("estimate", "actual"))
        .join(keys, ["database_oid", "user_oid", "query_id"])
        .agg(F.count("*").alias("n"), F.sum("calls").alias("calls"))
        .collect()[0]
    )
    assert src["n"] > len(rows), "fixture no longer exercises the add path"
    assert total_calls == src["calls"], (
        f"groupPlans sum {total_calls} != keyed source sum {src['calls']}"
    )


def test_curation_manifest_partitions_the_corpus(prepared_spark):
    """Every document gets exactly one disposition; kept rows carry split
    and mixing weight, dropped rows carry neither; eval-source docs are
    always held out."""
    from collector_spark.ml.curation import EVAL_SOURCE

    rows = _run(prepared_spark, "ml_curation_manifest").collect()
    n_docs = prepared_spark.table("documents").count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    for r in rows:
        if r["kept"]:
            assert r["disposition"] == "kept"
            assert r["split"] in ("train", "valid", "test")
            assert r["mixing_weight"] is not None
        else:
            assert r["disposition"] != "kept"
            assert r["split"] is None and r["mixing_weight"] is None
        if r["source"] == EVAL_SOURCE:
            assert r["disposition"] == "eval_source"
    # the composition must exercise more than a pass-through
    assert {r["disposition"] for r in rows} >= {
        "kept",
        "eval_source",
        "near_duplicate",
    }


def test_winnowing_catches_near_identical_pairs(prepared_spark):
    """Schleimer et al.'s guarantee covers shared substrings of length
    >= w + k - 1; the fixture's duplicates are near-dups (no byte-exact
    pairs), but a pair sharing >= 95% of its word trigrams shares long
    literal runs, so every such pair must surface in the winnowing match
    table with a strong single-offset alignment."""
    from collector_spark.ml.dedup import (
        _jaccard_truth,
        _persisted_shingles,
    )

    truth = [
        (r["doc_a"], r["doc_b"])
        for r in _jaccard_truth(_persisted_shingles(prepared_spark)).collect()
        if r["jaccard"] >= 0.95
    ]
    if not truth:
        import pytest

        pytest.skip("fixture has no >=0.95-Jaccard pairs")
    matches = {
        (r["doc_a"], r["doc_b"]): r
        for r in _run(prepared_spark, "ml_winnowing_matches").collect()
    }
    from collector_spark.ml.textstats import WINNOW_MIN_ALIGNED

    for pair in truth:
        assert pair in matches, f"near-identical pair {pair} missing"
        assert matches[pair]["n_aligned"] >= WINNOW_MIN_ALIGNED


def test_lsh_tuning_monotonicity(prepared_spark):
    """Narrower bands (smaller rows-per-band) can only catch MORE pairs,
    and the theoretical S-curve rises with the threshold and falls with
    rows-per-band at fixed threshold."""
    rows = _run(prepared_spark, "ml_lsh_tuning").collect()
    by_rt = {(r["rows_per_band"], r["threshold"]): r for r in rows}
    rs = sorted({r["rows_per_band"] for r in rows})
    ts = sorted({r["threshold"] for r in rows})
    for t in ts:
        caught = [by_rt[(r, t)]["caught_pairs"] for r in rs]
        assert caught == sorted(caught, reverse=True), (
            f"caught not non-increasing in rows_per_band at t={t}: {caught}"
        )
        theory = [by_rt[(r, t)]["theory_capture"] for r in rs]
        assert theory == sorted(theory, reverse=True)
    for r in rs:
        theory = [by_rt[(r, t)]["theory_capture"] for t in ts]
        assert theory == sorted(theory), (
            f"theory not rising with threshold at r={r}: {theory}"
        )
