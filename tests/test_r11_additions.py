"""Round-11 pins, part 1 (the ADVICE items): the quantized-log grid's
cross-libm agreement made empirical, and the E113 quality classifier's
degenerate one-class corpus guard."""

from __future__ import annotations

from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

# 60 words, mean word length 4.1, 12 stopword hits, zero symbols — passes
# every Gopher document rule
_KEEP_TEXT = ("the quick brown foxes jump over lazy dogs and then " * 6).strip()
_DROP_TEXT = "x y z"  # 3 words < GOPHER_MIN_WORDS -> drop


def _doc_rows(text: str, n: int):
    return [(i, text, "en", "s", len(text)) for i in range(n)]


# -- _qlog cross-engine agreement -------------------------------------------


def test_qlog_grid_cross_engine(spark, duck):
    """The quantized-log grid floor(ln(k) * 2^20) rests on JVM Math.log and
    DuckDB ln() agreeing at every floor boundary actually reached (see the
    residual-risk note at textstats._qlog). Pin it empirically: the grids
    are IDENTICAL for every k in 1..200000 and in a large-k band, in this
    container."""
    from collector_spark.ml.textstats import NB_SCALE, _qlog

    bands = [(1, 200_001), (10**12, 10**12 + 20_000)]
    for lo, hi in bands:
        got = [
            r.q
            for r in spark.range(lo, hi)
            .select(_qlog(F.col("id")).alias("q"))
            .collect()
        ]
        want = [
            r[0]
            for r in duck.execute(
                f"SELECT CAST(floor(ln(CAST(k AS DOUBLE)) * {NB_SCALE}) AS BIGINT)"
                f" FROM generate_series({lo}, {hi - 1}) t(k) ORDER BY k"
            ).fetchall()
        ]
        assert got == want, f"qlog grid diverged in band [{lo}, {hi})"


# -- E113 one-class corpus guard --------------------------------------------


def _nbq_run(spark, docs):
    from collector_spark.ml.curation import (
        _nbq_counts,
        _nbq_token_rows,
        nb_quality_from_counts,
    )

    return nb_quality_from_counts(
        spark, _nbq_counts(_nbq_token_rows(docs)), docs
    ).collect()


def test_nb_quality_all_keep_corpus(spark):
    """A corpus where EVERY doc passes the Gopher rules trains only the
    keep class; the guard must predict keep for every row instead of
    annihilating the result through an empty crossJoin side."""
    docs = spark.createDataFrame(_doc_rows(_KEEP_TEXT, 8), DOC_SCHEMA)
    rows = _nbq_run(spark, docs)
    assert len(rows) == 8
    assert all(r.label_keep and r.pred_keep and r.agree for r in rows)


def test_nb_quality_all_drop_corpus(spark):
    """Symmetric: an all-drop corpus predicts drop for every row."""
    docs = spark.createDataFrame(_doc_rows(_DROP_TEXT, 8), DOC_SCHEMA)
    rows = _nbq_run(spark, docs)
    assert len(rows) == 8
    assert all((not r.label_keep) and (not r.pred_keep) and r.agree for r in rows)


# -- E118/E119 ROC + AUC ------------------------------------------------------


def test_quality_auc_separable_corpus_is_one(spark):
    """On a corpus the classifier separates perfectly (every keep doc
    scores above every drop doc — the mixed corpus from the guard tests),
    the binned Mann-Whitney AUC is exactly 1.0 and the ROC endpoints
    close (lowest bin carries tp = P, fp = N)."""
    from collector_spark.ml.curation import quality_auc, quality_roc

    docs = spark.createDataFrame(
        _doc_rows(_KEEP_TEXT, 5)
        + [(10 + i, _DROP_TEXT, "en", "s", len(_DROP_TEXT)) for i in range(5)],
        DOC_SCHEMA,
    )
    auc = quality_auc(spark, docs).collect()
    assert len(auc) == 1
    assert (auc[0].n_pos, auc[0].n_neg) == (5, 5)
    assert auc[0].auc == 1.0

    curve = quality_roc(spark, docs).collect()
    # tpr/fpr monotone along the curve (bins ascend, cums descend)
    tps = [r.tp for r in curve]
    fps = [r.fp for r in curve]
    assert tps == sorted(tps, reverse=True)
    assert fps == sorted(fps, reverse=True)
    assert (curve[0].tp, curve[0].fp) == (5, 5)  # lowest bin sees all


def test_quality_auc_one_class_corpus_is_null(spark):
    """Degenerate one-class corpus: counts report, AUC is NULL (no pair
    to rank), and the curve's fpr column is NULL throughout."""
    from collector_spark.ml.curation import quality_auc, quality_roc

    docs = spark.createDataFrame(_doc_rows(_KEEP_TEXT, 6), DOC_SCHEMA)
    row = quality_auc(spark, docs).collect()[0]
    assert (row.n_pos, row.n_neg) == (6, 0)
    assert row.auc is None
    assert all(r.fpr is None for r in quality_roc(spark, docs).collect())


def test_quality_pr_separable_corpus(spark):
    """E121 on the separable corpus: at the top occupied bin precision is
    1.0 (no false positive scores that high) and at the bottom bin recall
    is 1.0 with precision = P/(P+N)."""
    from collector_spark.ml.curation import quality_pr

    docs = spark.createDataFrame(
        _doc_rows(_KEEP_TEXT, 5)
        + [(10 + i, _DROP_TEXT, "en", "s", len(_DROP_TEXT)) for i in range(5)],
        DOC_SCHEMA,
    )
    rows = quality_pr(spark, docs).collect()
    top, bottom = rows[-1], rows[0]
    assert top.precision == 1.0 and top.fp == 0
    assert bottom.recall == 1.0 and bottom.precision == 0.5
    # F1 at the perfect cutoff is 1.0 somewhere on the curve
    assert any(r.f1 == 1.0 for r in rows)


def test_quality_margin_quantiles_ordered_and_covering(spark):
    """E122 axioms: quantile edges are monotone (q25 <= q50 <= q75 <=
    q90), every quantile is an occupied bin's lower edge, and on a
    one-source separable corpus with 5 keep + 5 drop docs the median
    straddles the class boundary (p25 in the drop bin, p75 in the keep
    bin)."""
    from collector_spark.ml.curation import quality_margin_quantiles

    docs = spark.createDataFrame(
        _doc_rows(_KEEP_TEXT, 5)
        + [(10 + i, _DROP_TEXT, "en", "s", len(_DROP_TEXT)) for i in range(5)],
        DOC_SCHEMA,
    )
    rows = quality_margin_quantiles(spark, docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_docs == 10
    assert r.q25_lo <= r.q50_lo <= r.q75_lo <= r.q90_lo
    assert r.q25_lo < 0 < r.q75_lo  # drop margins negative, keep positive


def test_padding_waste_exact_small_corpus(spark):
    """E124 on a corpus built to land on exact power-of-two boundaries
    (the float-log flip class): a 64-token doc buckets to log2=6, a
    600-token doc to log2=9 with 88 truncated tokens, and the waste
    arithmetic reconciles exactly."""
    from collector_spark.ml.curation import PACK_BUDGET, padding_waste

    w64 = " ".join(f"w{i}" for i in range(64))
    w600 = " ".join(f"w{i}" for i in range(600))
    docs = spark.createDataFrame(
        [(1, w64, "en", "s", len(w64)), (2, w600, "en", "s", len(w600))],
        DOC_SCHEMA,
    )
    out = {r.len_log2: r for r in padding_waste(spark, docs).collect()}
    assert set(out) == {6, 9}
    assert out[6].len_lo == 64 and out[9].len_lo == 512
    assert out[6].kept_tokens == 64
    assert out[6].pad_waste == PACK_BUDGET - 64
    assert out[9].truncated_tokens == 600 - PACK_BUDGET
    assert out[9].pad_waste == 0 and out[9].waste_frac == 0.0


# -- E120 duplicate n-gram fraction ------------------------------------------


def test_dup_ngram_fraction_bounds(spark):
    """Two identical docs -> every n-gram incidence duplicated (frac 1.0);
    a unique doc sharing nothing -> frac 0.0; duplication counts CROSS
    source boundaries (a copy in another source still marks both)."""
    from collector_spark.ml.dedup import dup_ngram_fraction

    twin = "alpha beta gamma delta epsilon zeta eta theta"
    lone = "one unrepeated sentence nothing shares with anything else here"
    docs = spark.createDataFrame(
        [
            (1, twin, "en", "a", len(twin)),
            (2, twin, "en", "a", len(twin)),
            (3, lone, "en", "b", len(lone)),
            (4, twin, "en", "c", len(twin)),  # cross-source copy
        ],
        DOC_SCHEMA,
    )
    out = {r.source: r for r in dup_ngram_fraction(spark, docs).collect()}
    assert out["a"].dup_frac == 1.0
    assert out["b"].dup_frac == 0.0
    assert out["c"].dup_frac == 1.0
    # per-doc distinct trigrams of an 8-word doc: 6
    assert out["a"].n_incidences == 12 and out["a"].n_distinct_ngrams == 6
    assert out["c"].n_incidences == 6


# -- ST30/ST31 batch equality at an unseen batching ---------------------------


def test_stream_quality_roc_batch_equal(prepared_spark):
    """The streamed (label, tok) count state scored + curved must equal
    the batch curve row-for-row at an arrival batching the batch form
    never saw."""
    from collector_spark.ml.curation import quality_roc
    from collector_spark.streaming.doc_stream import stream_quality_roc

    batch = quality_roc(prepared_spark).collect()
    streamed = (
        stream_quality_roc(prepared_spark, n_arrival_batches=3)
        .orderBy("bin")
        .collect()
    )
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]


def test_stream_dup_ngrams_batch_equal(prepared_spark):
    """The additive (source, h) incidence state folded across 3 arrival
    batches reports identically to the batch form."""
    from collector_spark.ml.dedup import dup_ngram_fraction
    from collector_spark.streaming.doc_stream import stream_dup_ngrams

    batch = dup_ngram_fraction(prepared_spark).collect()
    streamed = (
        stream_dup_ngrams(prepared_spark, n_arrival_batches=3)
        .orderBy("source")
        .collect()
    )
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]


def test_stream_padding_waste_batch_equal(prepared_spark):
    """ST32: the additive per-bucket state folded across 3 arrival
    batches reports identically to the batch form."""
    from collector_spark.ml.curation import padding_waste
    from collector_spark.streaming.doc_stream import stream_padding_waste

    batch = padding_waste(prepared_spark).collect()
    streamed = (
        stream_padding_waste(prepared_spark, n_arrival_batches=3)
        .orderBy("len_log2")
        .collect()
    )
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]


def test_stream_weighted_sample_batch_equal(prepared_spark):
    """ST33 is a TRUE carry-over-state op (a doc admitted to the top-K in
    batch 1 can be evicted by batch 4's arrivals): the maintained top-K
    must equal the batch sampler row-for-row at an arrival batching the
    batch form never saw."""
    from collector_spark.ml.curation import token_weighted_sample
    from collector_spark.streaming.doc_stream import stream_weighted_sample

    batch = token_weighted_sample(prepared_spark).collect()
    streamed = stream_weighted_sample(prepared_spark, n_arrival_batches=3).collect()
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]


def test_weighted_sample_quota_and_determinism(prepared_spark):
    """E125 mechanics: exactly min(WSAMPLE_K, source size) rows per
    source, ranks contiguous from 1, and the sample is a pure function
    of the corpus (two derivations byte-identical)."""
    from pyspark.sql import functions as FF

    from collector_spark.ml.curation import WSAMPLE_K, token_weighted_sample

    spark = prepared_spark
    out = token_weighted_sample(spark).collect()
    sizes = {
        r["source"]: r["n"]
        for r in spark.table("documents")
        .groupBy("source")
        .agg(FF.count("*").alias("n"))
        .collect()
    }
    per = {}
    for r in out:
        per.setdefault(r.source, []).append(r.sample_rank)
    assert set(per) == set(sizes)
    for src, ranks in per.items():
        assert ranks == list(range(1, min(WSAMPLE_K, sizes[src]) + 1))
    again = token_weighted_sample(spark).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in out]


# -- IVF index persistence cycle ----------------------------------------------


def test_ivf_index_roundtrip_serves_identically(prepared_spark, tmp_path):
    """Build-once/serve-many: the trained IVF index written as parquet
    relations (centroids + cid-partitioned inverted lists) must serve the
    EXACT same top-k as the in-plan trainer (doubles round-trip parquet
    bit-exactly), and the serve plan must contain no k-means iteration
    (its plan is a fraction of the trainer's size)."""
    from collector_spark.ml.similarity import (
        ivf_index_write,
        ivf_trained_topk,
        ivf_trained_topk_from_index,
    )

    spark = prepared_spark
    idx = str(tmp_path / "ivf_index")
    audit = {r.relation: r.n_rows for r in ivf_index_write(spark, idx).collect()}
    assert audit["lists"] == spark.table("embeddings").count()
    assert audit["centroids"] > 0

    served = ivf_trained_topk_from_index(spark, idx)
    trained = ivf_trained_topk(spark)
    assert [tuple(r) for r in served.collect()] == [
        tuple(r) for r in trained.collect()
    ]

    # no training in the serve plan: the trainer's unrolled Lloyd
    # iterations make its plan several times larger
    p_serve = served._jdf.queryExecution().optimizedPlan().toString()
    p_train = trained._jdf.queryExecution().optimizedPlan().toString()
    assert len(p_serve) < len(p_train) / 2


# -- E94 end-to-end pipeline at sf0.1 ---------------------------------------


def test_export_pipeline_reconciles_at_sf01(tmp_path):
    """The r10 write-path reconciliation ran only at fixture scale; this
    runs the WHOLE pipeline (dedup + quality keep-lists -> manifest ->
    real partitioned parquet write -> read-back) at sf0.1 in an isolated
    interpreter (its own SparkSession — re-pointing the shared session's
    views at a different SF would poison the pinned-relation caches) and
    reconciles files against the manifest exactly as the fixture-scale
    test does."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(
        f"""
        import os
        os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
        os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
        from collector_spark.session import get_spark
        from collector_spark import registry
        from collector_spark.ml.export import (
            EXPORT_MAX_RECORDS, export_corpus, export_manifest,
        )
        from pyspark.sql import functions as F

        spark = get_spark("export_sf01_test")
        registry.load_all()
        registry.prepare(spark, "/root/testdata/sf0.1")
        plan = {{r["source"]: r for r in export_manifest(spark).collect()}}
        out = {str(tmp_path / "corpus")!r}
        audit = {{r["source"]: r for r in export_corpus(spark, out).collect()}}
        assert set(audit) == set(plan), (sorted(audit), sorted(plan))
        n_parts = sum(r["n_shards"] for r in plan.values())
        for src, p in plan.items():
            assert audit[src]["n_docs"] == p["n_docs"], src
        total_files = sum(a["n_files"] for a in audit.values())
        assert total_files <= n_parts + len(plan), (total_files, n_parts)
        per_file = (
            spark.read.parquet(out)
            .withColumn("_f", F.input_file_name())
            .groupBy("_f").count().agg(F.max("count")).first()[0]
        )
        assert per_file <= EXPORT_MAX_RECORDS, per_file
        total_kept = sum(p["n_docs"] for p in plan.values())
        assert total_kept > 0
        print("SF01_EXPORT_OK", total_kept, total_files)
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=540,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "SF01_EXPORT_OK" in proc.stdout


def test_nb_quality_mixed_corpus_still_classifies(spark):
    """The guard must be a no-op when both classes are present: a cleanly
    separable mixed corpus classifies every doc to its rule label."""
    docs = spark.createDataFrame(
        _doc_rows(_KEEP_TEXT, 5)
        + [(10 + i, _DROP_TEXT, "en", "s", len(_DROP_TEXT)) for i in range(5)],
        DOC_SCHEMA,
    )
    rows = _nbq_run(spark, docs)
    assert len(rows) == 10
    assert all(r.agree for r in rows)
