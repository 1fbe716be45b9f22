"""Round-10 session-6 property pins: per-source boilerplate strip (E108 +
its ST25 streaming twin), PMI collocations (E109), and the Naive-Bayes
language classifier (E110). Cross-engine equality for all four is covered
by the registry oracle sweep; these tests pin the SEMANTIC claims the
oracles cannot express (threshold conjunct behavior, streaming batch
equality at an unseen arrival batching, association ordering, separable
classification)."""

from __future__ import annotations

from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
DLC_SCHEMA = "source string, doc_id long, line_text string, n_rows long"


# -- E108 ------------------------------------------------------------------


def test_boilerplate_threshold_conjuncts(prepared_spark):
    """A line must clear BOTH thresholds (>= MIN_DOCS distinct docs AND
    > PCT% of the source's docs) to be boilerplate; each conjunct is
    exercised alone."""
    from collector_spark.ml.curation import boilerplate_from_doc_line_counts

    spark = prepared_spark
    # source "big": 200 docs. "TEMPLATE" in docs 0..29 (30 >= 3 and 15% > 5%
    # -> boiler). "rare" in docs 0..1 (2 < 3 -> not). "semi" in docs 0..8
    # (9 >= 3 but 4.5% < 5% -> not).
    docs = spark.createDataFrame(
        [(i, "x", "en", "big", 1) for i in range(200)], DOC_SCHEMA
    )
    dlc_rows = (
        [("big", i, "TEMPLATE", 1) for i in range(30)]
        + [("big", i, "rare", 1) for i in range(2)]
        + [("big", i, "semi", 1) for i in range(9)]
        + [("big", i, f"unique {i}", 2) for i in range(200)]
    )
    dlc = spark.createDataFrame(dlc_rows, DLC_SCHEMA)
    out = boilerplate_from_doc_line_counts(spark, dlc, docs=docs).collect()
    by_doc = {r.doc_id: r for r in out}
    # doc 0 carries all three candidate lines + its unique line (x2 rows)
    r0 = by_doc[0]
    assert r0.n_lines == 1 + 1 + 1 + 2
    assert r0.n_boiler_lines == 1  # only TEMPLATE
    assert r0.boiler_chars == len("TEMPLATE")
    # doc 50 has only its unique line
    assert by_doc[50].n_boiler_lines == 0
    assert by_doc[50].kept_char_frac == 1.0
    # char audit reconciles everywhere
    for r in out:
        assert 0 < r.total_chars
        assert 0 <= r.boiler_chars <= r.total_chars


def test_boilerplate_footer_flagged_on_fixture(prepared_spark):
    """The F27 corpus-wide footer crosses both thresholds in every source
    where it appears, so every doc containing it reports >= its footer
    rows as boilerplate; totals reconcile with the raw line relation."""
    from collector_spark.fixtures.defs import _DOC_LINES_FOOTER
    from collector_spark.ml.curation import boilerplate_lines

    out = boilerplate_lines(prepared_spark)
    lines = prepared_spark.table("doc_lines")
    footer_per_doc = {
        r.doc_id: r.n
        for r in lines.filter(F.col("line_text") == _DOC_LINES_FOOTER)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert footer_per_doc, "fixture footer leg vanished"
    rows = {r.doc_id: r for r in out.collect()}
    for doc_id, n_footer in footer_per_doc.items():
        assert rows[doc_id].n_boiler_lines >= n_footer, doc_id
    # row-count reconciliation: sum of n_lines == raw line rows
    assert sum(r.n_lines for r in rows.values()) == lines.count()


def test_stream_boilerplate_batch_equal(prepared_spark):
    """ST25 == E108 at an arrival batching the batch form never saw."""
    from collector_spark.ml.curation import boilerplate_lines
    from collector_spark.streaming.doc_stream import stream_boilerplate

    batch = sorted(map(tuple, boilerplate_lines(prepared_spark).collect()))
    streamed = sorted(
        map(tuple, stream_boilerplate(prepared_spark, n_arrival_batches=4).collect())
    )
    assert streamed == batch


# -- E109 ------------------------------------------------------------------


def test_pmi_collocation_found_and_thresholds_respected(prepared_spark):
    from collector_spark.ml.curation import (
        PMI_MIN_COUNT,
        PMI_MIN_LIFT,
        pmi_collocations,
    )

    spark = prepared_spark
    # "zzcolloc yycolloc" always adjacent (8 docs); filler vocab breaks
    # independence symmetry; "aafiller bbfiller" occurs 3 times (< MIN_COUNT)
    rows = []
    for i in range(8):
        rows.append((i, "zzcolloc yycolloc qq rr ss tt uu vv", "en", "s", 1))
    for i in range(3):
        rows.append((100 + i, "aafiller bbfiller qq ss uu rr tt vv", "en", "s", 1))
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    out = pmi_collocations(spark, docs=docs)
    got = {(r.w1, r.w2): r for r in out.collect()}
    assert ("zzcolloc", "yycolloc") in got
    r = got[("zzcolloc", "yycolloc")]
    # exact-formula reconciliation
    assert r.lift == (r.n_pair * r.n_bigrams) / (r.n_left * r.n_right)
    assert ("aafiller", "bbfiller") not in got  # under MIN_COUNT
    for r in got.values():
        assert r.n_pair >= PMI_MIN_COUNT
        assert r.n_pair * r.n_bigrams >= PMI_MIN_LIFT * r.n_left * r.n_right


# -- E110 ------------------------------------------------------------------


def test_nb_langid_separable_corpus_is_diagonal(prepared_spark):
    """Disjoint per-language vocab -> the NB argmax recovers every label
    exactly (confusion matrix is diagonal)."""
    from collector_spark.ml.textstats import nb_langid

    spark = prepared_spark
    rows = []
    for i in range(12):
        rows.append((i, "aa bb cc aa bb", "en", "s", 1))
        rows.append((100 + i, "dd ee ff dd ee", "de", "s", 1))
        rows.append((200 + i, "gg hh ii gg hh", "fr", "s", 1))
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    out = {(r.true_lang, r.pred_lang): r.n_docs for r in nb_langid(spark, docs=docs).collect()}
    assert out == {("en", "en"): 12, ("de", "de"): 12, ("fr", "fr"): 12}


def test_nb_langid_confusion_reconciles_on_fixture(prepared_spark):
    from collector_spark.ml.textstats import nb_langid

    out = nb_langid(prepared_spark).collect()
    docs = prepared_spark.table("documents")
    per_lang = {
        r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert sum(r.n_docs for r in out) == docs.count()
    row_sums: dict[str, int] = {}
    for r in out:
        row_sums[r.true_lang] = row_sums.get(r.true_lang, 0) + r.n_docs
        assert r.pred_lang in per_lang  # predictions come from trained labels
    assert row_sums == per_lang


# -- E111 ------------------------------------------------------------------


def test_threshold_sweep_monotone_and_consistent(prepared_spark):
    """Counts are monotone non-increasing in the threshold, and the
    integer-compare form at t=0.5 flags exactly the pairs the float-form
    verify stage (ml_ngram_jaccard, threshold=0.5) emits."""
    from collector_spark.ml.dedup import dedup_threshold_sweep, ngram_jaccard_pairs

    rows = sorted(dedup_threshold_sweep(prepared_spark).collect(), key=lambda r: r.threshold)
    assert [r.threshold for r in rows] == [0.5, 0.6, 0.7, 0.8, 0.9]
    for a, b in zip(rows, rows[1:]):
        assert a.n_pairs >= b.n_pairs
        assert a.n_docs_flagged >= b.n_docs_flagged
        assert a.n_docs_dropped >= b.n_docs_dropped
        assert a.chars_dropped >= b.chars_dropped
    assert rows[0].n_pairs == ngram_jaccard_pairs(prepared_spark, threshold=0.5).count()
    for r in rows:
        # greedy drops never exceed docs touched minus one per pair-graph
        assert r.n_docs_dropped <= r.n_docs_flagged


# -- E112 ------------------------------------------------------------------


def test_phash_pigeonhole_exact_and_twin_silent(prepared_spark):
    """At fixture scale no block bucket reaches LSH_BUCKET_CAP, so the
    pigeonhole candidate generator is LOSSLESS for Hamming <= 3: the
    emitted pair set must EQUAL the brute-force <=3 ball over canonical
    fingerprints. Byte-identical twins (doc_id % 8 == 7 copies its
    leader exactly) never appear — canonical-first."""
    from collector_spark.ml.dedup import LSH_BUCKET_CAP
    from collector_spark.ml.multimodal import (
        PHASH_BANDS,
        PHASH_HAMMING_MAX,
        _PHASH_BLOCK,
        _phash_col,
        phash_neardup,
    )

    spark = prepared_spark
    out = {(r.doc_a, r.doc_b): r.hamming for r in phash_neardup(spark).collect()}
    assert out, "no near-dup pairs found on the F29 fixture"
    for a, b in out:
        assert a % 8 != 7 and b % 8 != 7, "byte-identical twin leaked"
    # brute-force ball over canonical fingerprints
    rows = (
        spark.table("media_phash_rows")
        .select(
            "doc_id",
            F.hex(F.col("payload")).alias("hx"),
            F.octet_length("payload").cast("long").alias("L"),
        )
        .select("doc_id", "hx", _phash_col().alias("phash"))
        .collect()
    )
    canon = {}
    seen_hx = {}
    for r in sorted(rows, key=lambda r: r.doc_id):
        if r.hx not in seen_hx:
            seen_hx[r.hx] = r.doc_id
            canon[r.doc_id] = r.phash
    ids = sorted(canon)
    ball = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(canon[a] ^ canon[b]).count("1")
            if h <= PHASH_HAMMING_MAX:
                ball[(a, b)] = h
    # no bucket over cap (the losslessness precondition)
    mask = (1 << _PHASH_BLOCK) - 1
    buckets = {}
    for d, ph in canon.items():
        for band in range(PHASH_BANDS):
            key = (band, (ph >> (band * _PHASH_BLOCK)) & mask)
            buckets[key] = buckets.get(key, 0) + 1
    assert max(buckets.values()) <= LSH_BUCKET_CAP
    assert out == ball


# -- ST26 ------------------------------------------------------------------


def test_stream_pmi_batch_equal(prepared_spark):
    """ST26 == E109 at an arrival batching the batch form never saw."""
    from collector_spark.ml.curation import pmi_collocations
    from collector_spark.streaming.doc_stream import stream_pmi_collocations

    batch = sorted(map(tuple, pmi_collocations(prepared_spark).collect()))
    streamed = sorted(
        map(
            tuple,
            stream_pmi_collocations(prepared_spark, n_arrival_batches=4).collect(),
        )
    )
    assert streamed == batch


# -- E113 ------------------------------------------------------------------


def test_nb_quality_separable_and_total(prepared_spark):
    """Margins separate a vocab-disjoint corpus perfectly, and the audit
    is total over the fixture (one row per doc, agree == (pred==label))."""
    from collector_spark.ml.curation import (
        GOPHER_MIN_WORDS,
        GOPHER_STOPWORDS,
        nb_quality,
    )

    spark = prepared_spark
    # crafted corpus: "good" docs pass every Gopher rule (long, alpha,
    # stopword-rich); "bad" docs fail the word-count floor — vocab disjoint
    good = ("the be to of and that have with " + "alpha bravo " * 30).strip()
    assert len(good.split()) >= GOPHER_MIN_WORDS
    assert sum(w in GOPHER_STOPWORDS for w in good.split()) >= 2
    rows = [(i, good, "en", "s", len(good)) for i in range(10)]
    rows += [(100 + i, "zz yy xx", "en", "s", 8) for i in range(10)]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    out = nb_quality(spark, docs=docs).collect()
    assert len(out) == 20
    for r in out:
        assert r.agree, (r.doc_id, r.logodds_q)
        assert (r.logodds_q >= 0) == r.label_keep
    # fixture totality
    fx = nb_quality(prepared_spark)
    n_docs = prepared_spark.table("documents").count()
    assert fx.count() == n_docs
    bad = fx.filter((F.col("logodds_q") >= 0) != F.col("pred_keep")).count()
    assert bad == 0


# -- E114 ------------------------------------------------------------------


def test_phash_tuning_guarantee_and_cliff(prepared_spark):
    """On the fixture: recall == 1.0 wherever radius <= n_bands - 1 (the
    pigeonhole guarantee), truth counts monotone in radius and shared
    across configs. The blindness CLIFF past the guarantee is pinned on
    crafted fingerprints: B bits spread across all B blocks evade the
    B-band generator, while any Hamming <= B-1 pair cannot."""
    from collector_spark.ml.multimodal import (
        PHASH_BITS,
        _phash_shares_block,
        phash_tuning,
    )

    rows = phash_tuning(prepared_spark).collect()
    by_cfg = {(r.n_bands, r.radius): r for r in rows}
    assert len(rows) == 15
    for r in rows:
        assert r.guaranteed == (r.radius <= r.n_bands - 1)
        if r.guaranteed:
            assert r.recall == 1.0, (r.n_bands, r.radius)
    truths = {b: [by_cfg[(b, rad)].truth_pairs for rad in [1, 2, 3, 4, 5]] for b in [3, 4, 6]}
    assert truths[3] == truths[4] == truths[6]  # truth is config-independent
    for seq in truths.values():
        assert seq == sorted(seq)  # monotone in radius
    # crafted cliff: for B = 3 (16-bit blocks), flip one bit in EACH block
    spark = prepared_spark
    base = 0x0000_0000_0000
    spread = (1 << 0) | (1 << 16) | (1 << 32)  # 3 bits, 3 distinct blocks
    packed = (1 << 0) | (1 << 1) | (1 << 2)    # 3 bits, 1 block
    df = spark.createDataFrame(
        [(base, base ^ spread), (base, base ^ packed)], "pa long, pb long"
    )
    got = df.select(
        _phash_shares_block(3).alias("b3"), _phash_shares_block(4).alias("b4")
    ).collect()
    assert got[0].b3 is False  # 3 bands blind to 3-spread
    assert got[0].b4 is True   # 4 bands guaranteed at Hamming 3
    assert got[1].b3 is True   # packed flips stay within one block
    assert PHASH_BITS % 3 == 0 and PHASH_BITS % 4 == 0 and PHASH_BITS % 6 == 0


# -- ST27 / E115 -----------------------------------------------------------


def test_stream_nb_langid_batch_equal(prepared_spark):
    """ST27 == E110 at an arrival batching the batch form never saw."""
    from collector_spark.ml.textstats import nb_langid
    from collector_spark.streaming.doc_stream import stream_nb_langid

    batch = sorted(map(tuple, nb_langid(prepared_spark).collect()))
    streamed = sorted(
        map(tuple, stream_nb_langid(prepared_spark, n_arrival_batches=4).collect())
    )
    assert streamed == batch


def test_skipgram_window_semantics(prepared_spark):
    """Every pair within the window counts once per occurrence, nothing
    beyond the window; adjacent-pair counts reconcile with E109's
    generator on the same corpus."""
    from collector_spark.ml.curation import (
        SKIPGRAM_WINDOW,
        _bigram_pair_counts,
        _skipgram_pair_counts,
    )

    spark = prepared_spark
    docs = spark.createDataFrame(
        [(0, "a b c d e", "en", "s", 9)], DOC_SCHEMA
    )
    got = {
        (r.w1, r.w2): r.n_pair for r in _skipgram_pair_counts(docs).collect()
    }
    assert SKIPGRAM_WINDOW == 3
    expected = {
        ("a", "b"): 1, ("a", "c"): 1, ("a", "d"): 1,
        ("b", "c"): 1, ("b", "d"): 1, ("b", "e"): 1,
        ("c", "d"): 1, ("c", "e"): 1,
        ("d", "e"): 1,
    }
    assert got == expected  # ("a","e") is distance 4 — outside the window
    # distance-1 subset == the adjacent-bigram generator, on the fixture
    fx = prepared_spark.table("documents")
    adj = {
        (r.w1, r.w2): r.n_pair for r in _bigram_pair_counts(fx).collect()
    }
    skip = {
        (r.w1, r.w2): r.n_pair for r in _skipgram_pair_counts(fx).collect()
    }
    for k, v in adj.items():
        assert skip.get(k, 0) >= v  # skip-gram counts dominate adjacent


# -- E116 ------------------------------------------------------------------


def test_quality_sample_monotone_in_margin(prepared_spark):
    """The keep decision is exactly `logodds_q > logit_q` (pinned
    row-wise), acceptance is monotone in the margin (any kept doc's
    margin beats any dropped doc AT THE SAME hash draw — checked via the
    logit threshold), and the decision is reproducible (two runs agree
    bit-for-bit)."""
    from collector_spark.ml.curation import quality_sample

    out1 = quality_sample(prepared_spark).collect()
    out2 = quality_sample(prepared_spark).collect()
    assert [tuple(r) for r in out1] == [tuple(r) for r in out2]
    n_keep = 0
    for r in out1:
        assert r.keep == (r.logodds_q > r.logit_q), r.doc_id
        n_keep += r.keep
    # the fixture corpus produces both outcomes (not a degenerate filter)
    assert 0 < n_keep < len(out1)
    # extreme margins decide deterministically regardless of the draw:
    # logit_q spans +-qlog(M-1), so any |margin| beyond it is certain
    from collector_spark.ml.curation import QSAMPLE_M
    from collector_spark.ml.textstats import NB_SCALE
    import math

    bound = math.floor(math.log(QSAMPLE_M - 1) * NB_SCALE)
    for r in out1:
        if r.logodds_q > bound:
            assert r.keep
        if r.logodds_q < -bound:
            assert not r.keep


# -- ST28 / ST29 -----------------------------------------------------------


def test_stream_nb_quality_batch_equal(prepared_spark):
    """ST28 == E113 at an arrival batching the batch form never saw."""
    from collector_spark.ml.curation import nb_quality
    from collector_spark.streaming.doc_stream import stream_nb_quality

    batch = sorted(map(tuple, nb_quality(prepared_spark).collect()))
    streamed = sorted(
        map(tuple, stream_nb_quality(prepared_spark, n_arrival_batches=4).collect())
    )
    assert streamed == batch


def test_stream_skipgram_batch_equal(prepared_spark):
    """ST29 == E115 at an arrival batching the batch form never saw."""
    from collector_spark.ml.curation import skipgram_pmi
    from collector_spark.streaming.doc_stream import stream_skipgram_pmi

    batch = sorted(map(tuple, skipgram_pmi(prepared_spark).collect()))
    streamed = sorted(
        map(
            tuple,
            stream_skipgram_pmi(prepared_spark, n_arrival_batches=4).collect(),
        )
    )
    assert streamed == batch


# -- E117 ------------------------------------------------------------------


def test_corpus_balance_axioms(prepared_spark):
    """Shares sum to 1; entropy in [0, ln(n_src)]; Gini in [0, 1);
    uniform corpus -> entropy == ln(n) within grid error and Gini == 0;
    degenerate corpus -> entropy 0, Gini -> (n-1)/n."""
    import math

    from collector_spark.ml.curation import corpus_balance

    rows = corpus_balance(prepared_spark).collect()
    n_src = len(rows)
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-12
    ent = rows[0].entropy_nats
    gini = rows[0].gini
    assert 0.0 <= ent <= math.log(n_src) + 1e-9
    assert 0.0 <= gini < 1.0
    # uniform: 4 sources x identical text
    docs = prepared_spark.createDataFrame(
        [(i, "a b c d", "en", f"s{i % 4}", 7) for i in range(8)], DOC_SCHEMA
    )
    u = corpus_balance(prepared_spark, docs=docs).collect()
    assert abs(u[0].entropy_nats - math.log(4)) < 1e-5  # 2^-20 grid error
    assert u[0].gini == 0.0
    # degenerate: everything in one source
    docs1 = prepared_spark.createDataFrame(
        [(i, "a b c d", "en", "only", 7) for i in range(8)], DOC_SCHEMA
    )
    d = corpus_balance(prepared_spark, docs=docs1).collect()
    assert d[0].entropy_nats == 0.0
    assert d[0].gini == 0.0  # single source: (2*1 - 1 - 1) = 0
