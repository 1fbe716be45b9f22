"""Round-10 session-5 property pins: the text->vector bridge (E100/E101),
the k-NN label-vote probe (E102), source TVD (E103), and tokenizer
fertility (E104). Cross-engine equality for all five is covered by the
registry oracle sweep; these tests pin the SEMANTIC claims the oracles
cannot express (blocking reachability, exact-dup silence, distance
axioms, cross-report reconciliation). The near-dup blocking is the
All-Pairs maxweight index; the rejected rarest-dim variant's history is
in ml/vectors.py's module docstring."""

from __future__ import annotations

from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows)], DOC_SCHEMA
    )


# -- E100 ------------------------------------------------------------------


def test_hashed_tf_norm_reconciles_and_dims_bounded(prepared_spark):
    from collector_spark.ml.vectors import TF_DIM, hashed_tf_vectors

    out = hashed_tf_vectors(prepared_spark)
    bad = out.filter((F.col("dim") < 0) | (F.col("dim") >= TF_DIM)).count()
    assert bad == 0
    recon = (
        out.groupBy("doc_id", "norm_sq")
        .agg(F.sum(F.col("tf") * F.col("tf")).alias("s"))
        .filter(F.col("s") != F.col("norm_sq"))
        .count()
    )
    assert recon == 0
    # norm_sq is constant per doc: (doc_id, norm_sq) pairs == distinct docs
    assert (
        out.select("doc_id", "norm_sq").distinct().count()
        == out.select("doc_id").distinct().count()
    )


# -- E101 ------------------------------------------------------------------


def test_hashed_neardup_finds_near_and_silences_exact(prepared_spark):
    from collector_spark.ml.vectors import hashed_tf_neardup

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " * 5
    rows = [
        (base, "s"),                      # 0: canonical
        (base, "s"),                      # 1: exact dup of 0 -> silent
        (base + " kilo", "s"),            # 2: near dup of 0
        ("zz yy xx ww vv uu tt ss rr qq " * 5, "s"),  # 3: unrelated
    ]
    # padding with per-doc-unique vocab: realistic corpus shape (the
    # maxweight index needs a corpus, not two docs, for maxw to be
    # meaningful) and keeps the gate honest about unrelated docs
    rows += [(f"pad{i}a pad{i}b pad{i}c pad{i}d pad{i}e", "p") for i in range(10)]
    out = hashed_tf_neardup(prepared_spark, docs=_docs(prepared_spark, rows))
    pairs = {(r["doc_a"], r["doc_b"]): r for r in out.collect()}
    # exact dup never appears on either side of a pair (canonical-first)
    assert all(1 not in p for p in pairs)
    # the near-dup pair is reachable (shared rarest dims) and verified
    assert (0, 2) in pairs
    assert pairs[(0, 2)]["cosine"] >= 0.8
    # the unrelated doc pairs with nothing
    assert all(3 not in p for p in pairs)


def test_hashed_neardup_identical_content_has_cosine_one(prepared_spark):
    # two docs with the same bag of words in different order: cosine must
    # be exactly 1.0 (integer dot == integer norms), and the pair must be
    # reachable (identical vectors index identical maxweight prefixes)
    from collector_spark.ml.vectors import hashed_tf_neardup

    rows = [
        ("one two three four five six seven eight nine ten", "s"),
        ("ten nine eight seven six five four three two one", "s"),
    ]
    rows += [(f"pad{i}a pad{i}b pad{i}c pad{i}d pad{i}e", "p") for i in range(10)]
    out = hashed_tf_neardup(prepared_spark, docs=_docs(prepared_spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 1)
    assert r["cosine"] == 1.0
    assert r["dot"] == r["norm_a"] == r["norm_b"]


# -- E102 ------------------------------------------------------------------


def test_knn_label_vote_shape(prepared_spark):
    from collector_spark.ml.similarity import KNN_K, KNN_PROBES, knn_label_vote

    rows = knn_label_vote(prepared_spark).collect()
    n_probes = (
        prepared_spark.table("embeddings")
        .filter(F.col("vec_id") < KNN_PROBES)
        .count()
    )
    assert len(rows) == n_probes  # exactly one verdict per probe
    for r in rows:
        assert 1 <= r["votes"] <= KNN_K
        assert r["correct"] == int(r["pred_label"] == r["true_label"])


# -- E103 ------------------------------------------------------------------


def test_source_tvd_axioms(prepared_spark):
    from collector_spark.ml.textstats import source_tvd

    rows = [
        ("apple banana cherry", "a"),
        ("banana cherry apple", "b"),   # identical distribution as a
        ("dog elephant fox", "c"),      # disjoint vocab
        ("apple dog", "d"),             # half-overlapping
    ]
    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_tvd(prepared_spark, docs=_docs(prepared_spark, rows)).collect()
    }
    assert len(out) == 6  # C(4,2), strict a < b orientation only
    assert out[("a", "b")]["tvd"] == 0.0
    assert out[("a", "c")]["tvd"] == 1.0
    assert out[("a", "c")]["matched_terms"] == 0
    for r in out.values():
        assert 0.0 <= r["tvd"] <= 1.0


def test_source_tvd_bounds_on_fixture(prepared_spark):
    from collector_spark.ml.textstats import source_tvd

    bad = (
        source_tvd(prepared_spark)
        .filter((F.col("tvd") < 0) | (F.col("tvd") > 1))
        .count()
    )
    assert bad == 0


# -- E104 ------------------------------------------------------------------


def test_tokenizer_fertility_reconciles_with_bpe_encode(prepared_spark):
    from collector_spark.ml.curation import bpe_encode, tokenizer_fertility

    per_source = tokenizer_fertility(prepared_spark)
    per_doc = bpe_encode(prepared_spark)
    s = per_source.agg(
        F.sum("n_words").alias("w"),
        F.sum("n_tokens").alias("t"),
        F.sum("n_word_chars").alias("c"),
        F.sum("n_docs").alias("d"),
    ).collect()[0]
    d = per_doc.agg(
        F.sum("n_words").alias("w"),
        F.sum("n_tokens").alias("t"),
        F.sum("n_word_chars").alias("c"),
        F.count("*").alias("d"),
    ).collect()[0]
    assert (s["w"], s["t"], s["c"], s["d"]) == (d["w"], d["t"], d["c"], d["d"])


# -- ST23 --------------------------------------------------------------------


def test_stream_source_tvd_batch_equal(prepared_spark):
    """Additive (source, token) count state + the shared report stage:
    any arrival batching reproduces the batch TVD matrix row-for-row
    (n_arrival_batches=3 is a batching the batch form never saw)."""
    from collector_spark.ml.textstats import source_tvd
    from collector_spark.streaming.doc_stream import stream_source_tvd

    batch = source_tvd(prepared_spark).collect()
    streamed = stream_source_tvd(prepared_spark, n_arrival_batches=3).collect()
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]


# -- E106/E107 ----------------------------------------------------------------


def test_cdc_chunks_realign_after_insertion(prepared_spark):
    """The CDC property fixed-size blocking lacks: prepending one byte
    shifts every fixed block but chunk boundaries re-align at the next
    window hit, so all chunks after the first boundary keep their hashes."""
    import hashlib

    from collector_spark.ml.multimodal import _cdc_exploded

    base = hashlib.md5(b"cdc-test").digest() * 8  # 128 deterministic bytes
    shifted = b"\x01" + base
    media = prepared_spark.createDataFrame(
        [(0, "image/png", bytearray(base)), (1, "image/png", bytearray(shifted))],
        "doc_id long, media_type string, payload binary",
    )
    ch = _cdc_exploded(prepared_spark, media)
    a = {r["chash"] for r in ch.filter("doc_id = 0").collect()}
    b = {r["chash"] for r in ch.filter("doc_id = 1").collect()}
    # every chunk of the original except (at most) its first survives in
    # the shifted payload
    assert len(a & b) >= len(a) - 1
    assert len(a) >= 2  # the pin is vacuous if the payload made one chunk


def test_cdc_dedup_reconciles_bytes(prepared_spark):
    from collector_spark.ml.multimodal import cdc_dedup

    out = cdc_dedup(prepared_spark)
    total = out.agg(F.sum("total_bytes")).first()[0]
    payload_total = (
        prepared_spark.table("media_rows")
        .agg(F.sum(F.octet_length("payload")))
        .first()[0]
    )
    assert total == payload_total
    for r in out.collect():
        assert 0.0 <= r["dedup_ratio"] < 1.0
        assert r["distinct_chunks"] <= r["total_chunks"]


def test_stream_cdc_dedup_batch_equal(prepared_spark):
    """Additive chunk-copy-count state + the shared report stage: any
    arrival batching reproduces the batch chunk-store report row-for-row."""
    from collector_spark.ml.multimodal import cdc_dedup
    from collector_spark.streaming.doc_stream import stream_cdc_dedup

    batch = cdc_dedup(prepared_spark).collect()
    streamed = stream_cdc_dedup(prepared_spark, n_arrival_batches=3).collect()
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]
