"""Canonical-first span candidate generation stays linear under
exact-duplicate groups.

The window-hash candidate generator (ml/dedup.py _span_candidate_pairs)
composes the exact-dedup keep filter BEFORE gram generation: an
identical-content group of n documents shares every window hash, so a raw
self-match would emit C(n, 2) pairs per group — quadratic blowup inside
duplicate-heavy corpora. With the filter, only the group canonical
generates grams, so pair counts track true cross-document near-dup
structure (reference behavior modeled on Lee et al. 2022 exact-substring
dedup, which also dedups before suffix-array construction).
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def tiny_documents(prepared_spark):
    """Swap in a crafted documents view; restore the real one afterwards by
    re-registering the parquet-backed views (NOT a captured DataFrame
    handle, which relies on eager analysis pinning the original plan).
    Assumes serial test execution, like every fixture that swaps the
    session-scoped temp views."""
    spark = prepared_spark
    base = " ".join(f"w{i}" for i in range(40))  # 40 words >= SPAN_W
    rows = []
    # 8 exact duplicates of the same text -> raw generator would emit 28 pairs
    for i in range(8):
        rows.append((i, "dupsrc", base))
    # one doc embedding the same 40-word span inside extra text (true
    # cross-doc span duplication the generator MUST still surface)
    rows.append((100, "embed", "prefix words here " + base + " and a suffix"))
    # one unrelated doc
    rows.append((101, "other", " ".join(f"z{i}" for i in range(40))))
    spark.createDataFrame(rows, "doc_id long, source string, text string") \
        .createOrReplaceTempView("documents")
    yield spark
    from collector_spark import tables
    from tests.conftest import SF_DIR

    tables.register_views(spark, SF_DIR)


def test_span_candidates_linear_under_exact_dup_group(tiny_documents):
    from collector_spark.ml.dedup import _span_candidate_pairs

    pairs = {
        (r.doc_a, r.doc_b)
        for r in _span_candidate_pairs(tiny_documents).collect()
    }
    # quadratic identical-content pairs are gone: no pair has both ends in
    # the duplicate group (doc_ids 0..7)
    assert not any(a < 8 and b < 8 for a, b in pairs), pairs
    # the genuine cross-document span duplication is still surfaced, via
    # the group canonical (min doc_id = 0)
    assert (0, 100) in pairs
    # nothing else: exactly linear in the true near-dup structure
    assert pairs == {(0, 100)}, pairs
