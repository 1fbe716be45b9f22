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
