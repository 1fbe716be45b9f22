"""Property-based invariants of the end-to-end dedup composition
(ml/dedup.py dedup_keep_list) on random corpora with forced duplicate
structure — the guarantees the round-5 advisory fix established:

  1. totality: one decision row per document; keep <=> no drop_reason;
  2. per exact-duplicate group, exactly one member (the min doc_id) is not
     dropped as exact_duplicate;
  3. the asymmetric span rule never flags the corpus-minimum doc_id: the
     smallest document always survives with span_dup_fraction 0 — the
     "keep one occurrence" anchor that the pre-fix symmetric rule
     violated (identical twins annihilated).

The oracle sweep proves Spark==DuckDB; these prove the semantics on
corpora neither fixture covers.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# small vocabulary + word counts around SPAN_W so window sharing actually
# occurs; a shared 20-word sentence seeds cross-document span duplication
VOCAB = [f"w{i}" for i in range(12)]
SENT = " ".join(f"s{i}" for i in range(20))

texts = st.lists(
    st.tuples(
        st.lists(st.sampled_from(VOCAB), min_size=1, max_size=40),
        st.booleans(),  # embed the shared sentence?
    ),
    min_size=1,
    max_size=6,
)
clones = st.lists(st.integers(min_value=0, max_value=5), max_size=3)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(base=texts, clone_of=clones)
def test_keep_list_invariants(prepared_spark, base, clone_of):
    from collector_spark import tables
    from collector_spark.ml.dedup import dedup_keep_list
    from tests.conftest import SF_DIR

    docs = [
        (words if not embed else words + SENT.split() + words)
        for words, embed in [(list(w), e) for w, e in base]
    ]
    for src in clone_of:
        if src < len(docs):
            docs.append(list(docs[src]))
    rows = [
        (i, " ".join(words), "en", "s", 0) for i, words in enumerate(docs)
    ]
    prepared_spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).createOrReplaceTempView("documents")
    try:
        out = {r["doc_id"]: r for r in dedup_keep_list(prepared_spark).collect()}
        # 1. totality + reason consistency
        assert set(out) == {i for i, _ in enumerate(docs)}
        for r in out.values():
            assert r["keep"] == (r["drop_reason"] is None)
        # 2. exactly one non-exact-drop member per identical-content group
        groups: dict[str, list[int]] = {}
        for i, words in enumerate(docs):
            groups.setdefault(" ".join(words), []).append(i)
        for members in groups.values():
            not_exact_dropped = [
                m for m in members if out[m]["drop_reason"] != "exact_duplicate"
            ]
            assert not_exact_dropped == [min(members)], members
        # 3. the smallest doc_id always survives, un-flagged by spans
        assert out[0]["keep"], out[0]
        assert (out[0]["span_dup_fraction"] or 0.0) == 0.0
    finally:
        tables.register_views(prepared_spark, SF_DIR)


def test_exact_dup_flood_generates_no_candidate_pairs(prepared_spark):
    """r9 scale-killer fix: an exact-duplicate flood (one text cloned far
    past LSH_BUCKET_CAP) must contribute ZERO LSH candidate pairs — the
    signature build is canonical-first, so the group collapses to one doc
    before banding. Before the fix every member landed in identical band
    buckets (N^2/2 pairs per band at any N)."""
    from collector_spark import tables
    from collector_spark.ml.dedup import LSH_BUCKET_CAP, minhash_candidate_pairs
    from tests.conftest import SF_DIR

    n = LSH_BUCKET_CAP * 2  # far past the cap: canonical-first must bound it
    rows = [
        (i, "flood body shared verbatim across every clone", "en", "s", 0)
        for i in range(n)
    ]
    rows += [
        (n, "alpha beta gamma delta epsilon zeta", "en", "s", 0),
        (n + 1, "one two three four five six seven", "en", "s", 0),
    ]
    prepared_spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).createOrReplaceTempView("documents")
    try:
        pairs = minhash_candidate_pairs(prepared_spark).collect()
        non_canonical = set(range(1, n))
        assert all(
            r.doc_a not in non_canonical and r.doc_b not in non_canonical
            for r in pairs
        ), pairs
    finally:
        tables.register_views(prepared_spark, SF_DIR)


def test_bucket_cap_bounds_pair_expansion(prepared_spark):
    """The hard LSH_BUCKET_CAP bound in _candidate_pairs_from: a bucket
    with more than CAP members yields ZERO pairs (dropped in-plan); at
    exactly CAP it yields the full C(CAP,2) — the worst-case expansion is
    a compile-time constant, never data-scaled."""
    from collector_spark.ml.dedup import K, LSH_BUCKET_CAP, _candidate_pairs_from

    sig_cols = [f"CAST(0 AS BIGINT) AS mh{i}" for i in range(K)]
    over = prepared_spark.range(LSH_BUCKET_CAP + 1).selectExpr(
        "id AS doc_id", *sig_cols
    )
    assert _candidate_pairs_from(over).count() == 0
    at_cap = prepared_spark.range(LSH_BUCKET_CAP).selectExpr(
        "id AS doc_id", *sig_cols
    )
    expected = LSH_BUCKET_CAP * (LSH_BUCKET_CAP - 1) // 2
    assert _candidate_pairs_from(at_cap).count() == expected


def test_stream_bucket_expansion_is_canonical_and_capped(prepared_spark):
    """The streaming fold's compaction (_expand_bucket_pairs): per-content
    state rows whose min_doc is NOT the content's global canonical are
    dropped (exact-dup-safe — matches batch canonical-first), and buckets
    past LSH_BUCKET_CAP are dropped entirely."""
    from collector_spark.ml.dedup import LSH_BUCKET_CAP
    from collector_spark.streaming.doc_stream import _expand_bucket_pairs

    state = prepared_spark.createDataFrame(
        [
            # content cX seen in b1 only via a non-canonical member (its
            # canonical 3 appears under b2) -> the b1 row must drop
            ("b1", "cX", 5),
            ("b2", "cX", 3),
            ("b2", "cY", 7),
            ("b1", "cZ", 9),
        ],
        "bucket string, content_hash string, min_doc long",
    )
    got = sorted(
        (r.doc_a, r.doc_b) for r in _expand_bucket_pairs(state).collect()
    )
    assert got == [(3, 7)], got

    flood = prepared_spark.createDataFrame(
        [("hot", f"c{i}", i) for i in range(LSH_BUCKET_CAP + 1)],
        "bucket string, content_hash string, min_doc long",
    )
    assert _expand_bucket_pairs(flood).count() == 0


def test_incremental_dedup_all_three_arms(prepared_spark):
    """r9 E69: the incremental screen's three decision arms on a corpus
    where each provably fires (the sf0.01 fixture corpus holds no exact
    duplicates at all, so the oracle sweep alone exercises only the
    near/keep paths; sf0.1 has straddling exact groups). doc_id % 5 == 4
    is the incoming batch:

      doc 4  == doc 0's text verbatim      -> exact_duplicate, matched 0
      doc 9  == doc 1's text + one word    -> near_duplicate,  matched 1
      doc 14 == unrelated text             -> keep
    """
    from collector_spark.ml.dedup import incremental_dedup

    text_a = " ".join(f"a{i % 9}" for i in range(40))
    text_b = " ".join(f"b{i % 7}" for i in range(50))
    other = " ".join(f"z{i % 5}" for i in range(30))
    rows = [
        (0, text_a, "en", "s", 0),
        (1, text_b, "en", "s", 0),
        (4, text_a, "en", "s", 0),
        (9, text_b + " tail", "en", "s", 0),
        (14, other, "en", "s", 0),
    ]
    docs = prepared_spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {
        r.doc_id: (r.keep, r.drop_reason, r.matched_doc_id)
        for r in incremental_dedup(prepared_spark, docs).collect()
    }
    assert set(got) == {4, 9, 14}
    assert got[4] == (False, "exact_duplicate", 0)
    assert got[9] == (False, "near_duplicate", 1)
    assert got[14] == (True, None, None)


def test_simhash_pigeonhole_is_lossless_at_fixture_scale(prepared_spark):
    """r9 E69: with 12-bit blocks no sf0.01 bucket reaches LSH_BUCKET_CAP,
    so block-bucket candidates must equal the EXACT brute-force Hamming
    ball (<= SIMHASH_HAMMING_MAX) over canonical docs — the pigeonhole
    guarantee, not an approximation. (MinHash banding has no such test:
    its recall is probabilistic by construction.)"""
    from pyspark.sql import functions as F

    from collector_spark.ml.dedup import (
        SIMHASH_BITS,
        SIMHASH_HAMMING_MAX,
        _exact_canonicals,
        _simhash_from,
        simhash_candidate_pairs,
    )

    got = {
        (r.doc_a, r.doc_b)
        for r in simhash_candidate_pairs(prepared_spark).collect()
    }
    sim = _simhash_from(
        _exact_canonicals(prepared_spark.table("documents")), SIMHASH_BITS
    )
    a = sim.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = sim.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    brute = {
        (r.doc_a, r.doc_b)
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .filter(
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
            <= SIMHASH_HAMMING_MAX
        )
        .collect()
    }
    assert brute, "fixture must exercise the Hamming ball"
    assert got == brute


def test_bloom_screen_no_false_negatives(prepared_spark):
    """E77's structural guarantee: every true duplicate is flagged maybe
    (its content hash set all K bits when the existing corpus built the
    filter). False positives are allowed and reported — false negatives
    never."""
    from collector_spark.ml.dedup import bloom_screen

    rows = bloom_screen(prepared_spark).collect()
    assert rows
    for r in rows:
        if r.is_true_duplicate:
            assert r.maybe_duplicate, f"false negative at doc {r.doc_id}"
        assert r.is_false_positive == (r.maybe_duplicate and not r.is_true_duplicate)


def test_hll_error_within_theory_bound(prepared_spark):
    """E79: |relative error| must sit within ~4 sigma of the HLL theory
    bound 1.04/sqrt(m) — a broken rho/bucket width shows up as orders of
    magnitude, not percent."""
    from collector_spark.ml.dedup import HLL_M, hll_distinct

    row = hll_distinct(prepared_spark).collect()[0]
    bound = 4 * 1.04 / (HLL_M ** 0.5)
    assert abs(row.rel_error) < bound, row
    assert row.exact_distinct > 0


def test_cms_never_underestimates(prepared_spark):
    """E80's one-sided guarantee: min-of-counters >= true count, always
    (hash collisions only ADD mass). Overshoot stays within the
    (e / CMS_W) * stream-mass bound at 3x slack."""
    import math
    from pyspark.sql import functions as F
    from collector_spark.ml.dedup import CMS_W, cms_heavy_hitters

    rows = cms_heavy_hitters(prepared_spark).collect()
    assert rows
    total_mass = (
        prepared_spark.table("documents")
        .select(F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"))
        .count()
    )
    bound = 3 * math.e / CMS_W * total_mass
    for r in rows:
        assert r.overshoot >= 0, r
        assert r.cms_estimate == r.true_count + r.overshoot
        assert r.overshoot <= bound, (r, bound)


def test_minhash_estimator_error_within_binomial_bound(prepared_spark):
    """E81: per-pair |est - exact| should sit within ~5 sigma of the
    binomial bound 1/(2 sqrt(K)) and the mean error well under it — a
    broken permutation or banding shows up as order-of-magnitude error."""
    from collector_spark.ml.dedup import K, minhash_estimate_quality

    rows = minhash_estimate_quality(prepared_spark).collect()
    assert rows
    sigma_max = 0.5 / (K ** 0.5)
    errs = [r.abs_error for r in rows]
    assert max(errs) <= 5 * sigma_max, max(errs)
    assert sum(errs) / len(errs) <= 2 * sigma_max, sum(errs) / len(errs)
