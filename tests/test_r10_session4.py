"""Round-10 session-4 additions: dedup-run report invariants (E96-E98),
the token-budget quality cutoff's greedy-prefix semantics (E99), and the
streaming decontamination twin's batch equality (ST22)."""

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# E96 — per-source dedup stats
# ---------------------------------------------------------------------------


def test_dedup_stats_reconciles_with_keep_list(prepared_spark):
    """Every doc lands in exactly one of kept / exact / near / span, and the
    per-source totals reconcile with the corpus and the E30 keep-list."""
    from collector_spark.ml.dedup import dedup_keep_list, dedup_stats

    rows = dedup_stats(prepared_spark).collect()
    assert rows, "empty report"
    for r in rows:
        assert (
            r.n_kept + r.n_exact_dropped + r.n_near_dropped + r.n_span_dropped
            == r.n_docs
        ), f"{r.source}: drop reasons do not partition the docs"
        assert 0 < r.kept_chars <= r.total_chars
        assert 0.0 < r.keep_rate <= 1.0

    n_docs = prepared_spark.table("documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    n_kept = dedup_keep_list(prepared_spark).filter("keep").count()
    assert sum(r.n_kept for r in rows) == n_kept


# ---------------------------------------------------------------------------
# E97 — cluster-size histogram
# ---------------------------------------------------------------------------


def test_cluster_size_histogram_covers_members(prepared_spark):
    """docs_covered folds back to the member counts of the relations the
    histogram summarizes; sizes start at 2 (singletons are not clusters)."""
    from collector_spark.ml.dedup import (
        cluster_size_histogram,
        dup_clusters,
        exact_dup_groups,
    )

    hist = cluster_size_histogram(prepared_spark).collect()
    assert hist and all(r.size >= 2 for r in hist)
    assert all(r.docs_covered == r.size * r.n_clusters for r in hist)

    near_docs = sum(r.docs_covered for r in hist if r.method == "near")
    assert near_docs == dup_clusters(prepared_spark).count()

    exact_docs = sum(r.docs_covered for r in hist if r.method == "exact")
    assert (
        exact_docs
        == exact_dup_groups(prepared_spark).filter("group_size > 1").count()
    )


# ---------------------------------------------------------------------------
# E98 — method-agreement matrix
# ---------------------------------------------------------------------------


def test_method_agreement_bounds(prepared_spark):
    """Intersections are bounded by their operands and every agreement is a
    valid set-Jaccard; the fixture corpus has at least one near-dup pair
    per method so no leg is vacuous."""
    from collector_spark.ml.dedup import dedup_method_agreement

    [r] = dedup_method_agreement(prepared_spark).collect()
    assert r.n_minhash > 0 and r.n_simhash > 0 and r.n_containment > 0
    assert r.n_mh_sh <= min(r.n_minhash, r.n_simhash)
    assert r.n_mh_ct <= min(r.n_minhash, r.n_containment)
    assert r.n_sh_ct <= min(r.n_simhash, r.n_containment)
    for v in (r.agree_mh_sh, r.agree_mh_ct, r.agree_sh_ct):
        assert v is None or 0.0 <= v <= 1.0


# ---------------------------------------------------------------------------
# E99 — token-budget quality cutoff
# ---------------------------------------------------------------------------


def test_token_budget_cutoff_is_maximal_greedy_prefix(prepared_spark):
    """The grid + marginal-cell construction must equal the semantics it
    replaces: the LONGEST PREFIX of the corpus ordered by (quality DESC,
    doc_id) whose token sum stays within the budget — recomputed here
    driver-side, independent of the operator's cell machinery."""
    from collector_spark.ml.curation import (
        CUTOFF_BUDGET_FRAC,
        token_budget_cutoff,
    )
    from collector_spark.ml.textstats import quality_score

    out = {r.doc_id: r for r in token_budget_cutoff(prepared_spark).collect()}
    q = quality_score(prepared_spark).collect()
    total = sum(r.n_words for r in q)
    budget = int(total * CUTOFF_BUDGET_FRAC)

    expected_keep = set()
    cum = 0
    for r in sorted(q, key=lambda r: (-(r.quality_score or 0.0), r.doc_id)):
        if cum + r.n_words > budget:
            break
        cum += r.n_words
        expected_keep.add(r.doc_id)

    got_keep = {d for d, r in out.items() if r.keep}
    assert got_keep == expected_keep
    kept_tokens = sum(out[d].ws_tokens for d in got_keep)
    assert kept_tokens == cum <= budget
    # every region is realized at fixture scale
    assert {r.region for r in out.values()} == {"above", "marginal", "below"}


# ---------------------------------------------------------------------------
# ST22 — streaming decontamination twin
# ---------------------------------------------------------------------------


def test_stream_decontaminate_batch_equal(prepared_spark):
    """Row-local gram dedup + additive matched-count fold: any arrival
    batching reproduces the batch screen row-for-row."""
    from collector_spark.ml.curation import decontaminate
    from collector_spark.streaming.doc_stream import stream_decontaminate

    batch = decontaminate(prepared_spark).collect()
    streamed = stream_decontaminate(prepared_spark, n_arrival_batches=3).collect()
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]
