"""Round-10 additions: BPE trainer round-consistency, line-dedup
intra/cross attribution, Gopher line-rule fixture coverage, IVF tuning
curve invariants, and the driver-window rotation pin."""

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# E89 — iterative BPE trainer
# ---------------------------------------------------------------------------


def test_bpe_round_consistency(prepared_spark):
    """The verdict-mandated pin: round i+1's pair counts equal a
    from-scratch recount after applying merges 1..i. The from-scratch side
    replays the COLLECTED merge table as literal replacements onto the
    initial segmentation — independent of the lazy argmax chain the
    trainer embeds in its plan."""
    from collector_spark.ml.curation import (
        BPE_TRAIN_ROUNDS,
        _bpe_apply,
        _bpe_best,
        _bpe_pair_counts,
        _bpe_vocab_seg,
        bpe_train,
    )

    spark = prepared_spark
    merges = bpe_train(spark, BPE_TRAIN_ROUNDS).collect()
    assert len(merges) == BPE_TRAIN_ROUNDS
    assert [m.merge_rank for m in merges] == list(range(1, BPE_TRAIN_ROUNDS + 1))

    # chained (plan-embedded argmax) segmentation per round
    chained = _bpe_vocab_seg(spark)
    for i, m in enumerate(merges, start=1):
        chained = _bpe_apply(chained, _bpe_best(_bpe_pair_counts(chained)))

        # from-scratch: replay collected merges 1..i as literals
        scratch = _bpe_vocab_seg(spark)
        seg_col = F.col("seg")
        for mm in merges[:i]:
            pat = f" {mm.sym_a} {mm.sym_b} "
            rep = f" {mm.sym_a}{mm.sym_b} "
            seg_col = F.replace(
                F.replace(seg_col, F.lit(pat), F.lit(rep)), F.lit(pat), F.lit(rep)
            )
        scratch = scratch.select("wc", seg_col.alias("seg"))

        a = _bpe_pair_counts(chained)
        b = _bpe_pair_counts(scratch)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, (
            f"round {i + 1} counts diverge from from-scratch recount"
        )


def test_bpe_apply_is_greedy_leftmost(prepared_spark):
    """Double-replace equals exact greedy BPE on the overlap edge cases a
    single leftmost pass gets wrong: 'a a a' -> 'aa a' (not 'a aa'),
    'a b a b' -> 'ab ab' (single pass would leave the second pair)."""
    from collector_spark.ml.curation import _bpe_apply

    spark = prepared_spark
    segged = spark.createDataFrame(
        [(1, " a a a "), (1, " a b a b "), (1, " x a b y ")], ["wc", "seg"]
    )
    best_aa = spark.createDataFrame([("a", "a", 1)], ["sym_a", "sym_b", "pair_count"])
    got = {r.seg for r in _bpe_apply(segged, best_aa).collect()}
    assert " aa a " in got and " a b a b " in got

    best_ab = spark.createDataFrame([("a", "b", 1)], ["sym_a", "sym_b", "pair_count"])
    got = {r.seg for r in _bpe_apply(segged, best_ab).collect()}
    assert " ab ab " in got and " x ab y " in got


# ---------------------------------------------------------------------------
# E88 — corpus line-level dedup
# ---------------------------------------------------------------------------


def test_line_dedup_intra_vs_cross_attribution(prepared_spark):
    """Independent Python re-implementation of the first-owner rule over
    the same doc_lines fixture: every drop is attributed intra-doc iff the
    earliest (doc_id, line_no) owner is the same document."""
    from collector_spark.ml.dedup import line_dedup

    spark = prepared_spark
    lines = spark.table("doc_lines").select(
        "doc_id", "line_no", "line_text"
    ).collect()
    first = {}
    for r in sorted(lines, key=lambda r: (r.doc_id, r.line_no)):
        first.setdefault(r.line_text, (r.doc_id, r.line_no))
    expect = {}
    for r in lines:
        e = expect.setdefault(
            r.doc_id, {"n": 0, "kept": 0, "intra": 0, "cross": 0}
        )
        e["n"] += 1
        fdoc, fline = first[r.line_text]
        if (fdoc, fline) == (r.doc_id, r.line_no):
            e["kept"] += 1
        elif fdoc == r.doc_id:
            e["intra"] += 1
        else:
            e["cross"] += 1

    got = {r.doc_id: r for r in line_dedup(spark).collect()}
    assert set(got) == set(expect)
    for doc_id, e in expect.items():
        g = got[doc_id]
        assert (g.n_lines, g.n_kept, g.n_dropped_intra, g.n_dropped_cross) == (
            e["n"],
            e["kept"],
            e["intra"],
            e["cross"],
        ), doc_id
    # the fixture must exercise BOTH drop classes corpus-wide
    assert any(e["intra"] > 0 for e in expect.values())
    assert any(e["cross"] > 0 for e in expect.values())


# ---------------------------------------------------------------------------
# E87 — Gopher line-structure rules
# ---------------------------------------------------------------------------


def test_gopher_line_filters_exercises_every_leg(prepared_spark):
    """Each of the four line rules must have both passing and failing
    documents in the fixture (a rule nothing fails is untested), and some
    documents must survive all four."""
    from collector_spark.ml.curation import gopher_line_filters

    rows = gopher_line_filters(prepared_spark).collect()
    assert rows
    for flag in ("bullet_ok", "ellipsis_ok", "dup_line_ok", "dup_char_ok", "keep"):
        vals = {getattr(r, flag) for r in rows}
        assert vals == {True, False}, f"{flag} never varies: {vals}"


# ---------------------------------------------------------------------------
# E90 — IVF probe-tuning curve
# ---------------------------------------------------------------------------


def test_ivf_tuning_curve_invariants(prepared_spark):
    """Recall and scan cost are non-decreasing in nprobe at fixed nlist;
    probing every list (nlist=4, nprobe=4) recovers ALL truth candidates
    (recall exactly 1 — each corpus vector lives in some probed list)."""
    from collector_spark.ml.similarity import (
        IVF_TUNE_NLISTS,
        IVF_TUNE_NPROBES,
        ivf_tuning,
    )

    rows = ivf_tuning(prepared_spark).collect()
    assert len(rows) == len(IVF_TUNE_NLISTS) * len(IVF_TUNE_NPROBES)
    by_cfg = {(r.nlist, r.nprobe): r for r in rows}
    for L in IVF_TUNE_NLISTS:
        curve = [by_cfg[(L, p)] for p in sorted(IVF_TUNE_NPROBES)]
        for a, b in zip(curve, curve[1:]):
            assert a.recall <= b.recall + 1e-12
            assert a.avg_scanned <= b.avg_scanned + 1e-12
        for r in curve:
            assert 0.0 <= r.recall <= 1.0
    assert by_cfg[(4, 4)].recall == 1.0


# ---------------------------------------------------------------------------
# Driver-window rotation
# ---------------------------------------------------------------------------


def test_driver_window_is_registry_front():
    from collector_spark import registry
    from collector_spark.queries_catalog import DRIVER_WINDOW

    registry.load_all()
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    assert list(registry.REGISTRY)[:50] == DRIVER_WINDOW
