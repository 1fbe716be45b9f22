"""Round-12 pins, part 1 (the ADVICE + verdict hygiene items): the
registration-shadowing AST guard, and the E113 oracle's one-class corpus
guard mirroring the engine's cboth fold."""

from __future__ import annotations

import textwrap

import duckdb
import pandas as pd
import pytest

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"

# mirrors tests/test_r11_additions.py: passes / fails every Gopher rule
_KEEP_TEXT = ("the quick brown foxes jump over lazy dogs and then " * 6).strip()
_DROP_TEXT = "x y z"


def _doc_rows(text: str, n: int):
    return [(i, text, "en", "s", len(text)) for i in range(n)]


# -- registration-shadowing guard ---------------------------------------------


def test_rebound_def_fails_loudly(tmp_path):
    """A module that rebinds a top-level def (the r11 E53/E125 silent-shadow
    class) must fail the lint with the rebinding line, not pass quietly."""
    import importlib.util

    from collector_spark.registry import assert_no_rebound_defs

    src = textwrap.dedent(
        """
        def sampler():
            return 1


        def other():
            return 2


        def sampler():  # noqa: F811 — the defect under test
            return 3
        """
    )
    p = tmp_path / "shadowed_catalog_mod.py"
    p.write_text(src)
    spec = importlib.util.spec_from_file_location("shadowed_catalog_mod", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with pytest.raises(RuntimeError, match=r"rebinds def 'sampler'"):
        assert_no_rebound_defs(extra_modules=[mod])


def test_catalog_passes_rebound_lint():
    """The real catalog (every module contributing a registered callable)
    holds zero rebound top-level defs — and the lint actually ran at
    import time (load_all imports the catalog, whose tail invokes it)."""
    from collector_spark import registry

    registry.load_all()
    assert len(registry.REGISTRY) > 250
    # re-run explicitly over the full contributing-module set
    registry.assert_no_rebound_defs()


# -- E113 oracle one-class guard (ADVICE r11, medium) -------------------------


def _oracle_rows(docs_rows):
    from collector_spark.ml.curation import oracle_nb_quality

    con = duckdb.connect()
    try:
        con.register(
            "documents",
            pd.DataFrame(
                docs_rows,
                columns=["doc_id", "text", "lang", "source", "n_chars"],
            ),
        )
        return {
            r[0]: (r[1], r[2], r[3], r[4])
            for r in con.execute(oracle_nb_quality()).fetchall()
        }
    finally:
        con.close()


def _engine_rows(spark, docs_rows):
    from collector_spark.ml.curation import nb_quality

    docs = spark.createDataFrame(docs_rows, DOC_SCHEMA)
    return {
        r.doc_id: (r.label_keep, r.logodds_q, r.pred_keep, r.agree)
        for r in nb_quality(spark, docs).collect()
    }


@pytest.mark.parametrize("text", [_KEEP_TEXT, _DROP_TEXT], ids=["keep", "drop"])
def test_oracle_nb_quality_one_class_matches_engine(spark, text):
    """On a one-class corpus the old oracle's per-side CROSS JOINs
    annihilated every row while the engine (guarded since r11) predicted
    the trained class — the divergence ADVICE r11 flagged. The oracle now
    mirrors the cboth fold: engine == oracle on both degenerate corpora."""
    rows = _doc_rows(text, 6)
    got = _engine_rows(spark, rows)
    want = _oracle_rows(rows)
    assert len(got) == 6
    assert got == want


# -- full log pipeline composition (verdict item 6) ---------------------------


def test_log_pipeline_full_redacts_and_classifies(prepared_spark):
    """The composed fact actually redacts secondary STATEMENT/DETAIL
    content (quoted literals -> [redacted]) while primaries keep their
    classification — guards against the redaction stage silently no-oping
    inside the composition (both engine and oracle would agree on the
    unredacted text, so only this pin catches it)."""
    from collector_spark.registry import REGISTRY

    df = REGISTRY["log_pipeline_full"].spark_fn(prepared_spark)
    stmts = df.filter("log_level = 'STATEMENT'").limit(10).collect()
    assert stmts
    assert all("[redacted]" in r.content for r in stmts)
    assert not any("tok_" in r.content for r in stmts)
    prim = df.filter("log_level = 'ERROR'").limit(10).collect()
    assert prim and all(r.classification is not None for r in prim)


def test_stream_pipeline_schema_equals_batch(prepared_spark):
    from collector_spark.registry import REGISTRY

    b = REGISTRY["log_pipeline_full"].spark_fn(prepared_spark)
    s = REGISTRY["st_log_pipeline_full"].spark_fn(prepared_spark)
    assert [f.name for f in b.schema.fields] == [f.name for f in s.schema.fields]
    assert [f.dataType for f in b.schema.fields] == [
        f.dataType for f in s.schema.fields
    ]


def test_oracle_nb_quality_mixed_corpus_matches_engine(spark):
    """The rewritten oracle stays value-identical on a two-class corpus
    (the non-degenerate path the old per-side form covered)."""
    rows = _doc_rows(_KEEP_TEXT, 4) + [
        (10 + i, _DROP_TEXT, "en", "s", len(_DROP_TEXT)) for i in range(4)
    ]
    got = _engine_rows(spark, rows)
    want = _oracle_rows(rows)
    assert len(got) == 8
    assert got == want
    assert {v[0] for v in got.values()} == {True, False}


# -- near-dup index persistence cycle (verdict item 7) ------------------------


def test_neardup_index_roundtrip_serves_identically(prepared_spark, tmp_path):
    """Build-once/serve-many for the All-Pairs near-dup join: the
    persisted index (tf + capped maxweight prefix + per-doc stats) must
    serve the EXACT same pair set as the in-plan form (pure-integer
    relations round-trip parquet exactly), and the serve plan must
    contain NO window — the maxweight prefix selection and the per-dim
    cap (the expensive part of the build) happen only at index-write
    time."""
    from collector_spark.ml.vectors import (
        hashed_tf_neardup,
        hashed_tf_neardup_from_index,
        neardup_index_write,
    )

    spark = prepared_spark
    idx = str(tmp_path / "neardup_index")
    audit = {r.relation: r.n_rows for r in neardup_index_write(spark, idx).collect()}
    assert audit["tf"] > 0 and audit["index"] > 0
    assert audit["stats"] == spark.read.parquet(f"{idx}/tf").select(
        "doc_id"
    ).distinct().count()

    served = hashed_tf_neardup_from_index(spark, idx)
    inplan = hashed_tf_neardup(spark)
    assert [tuple(r) for r in served.collect()] == [
        tuple(r) for r in inplan.collect()
    ]

    # no indexing in the serve plan: the maxweight walk is two ordered
    # windows + the cap window; none may survive into the served form
    p_serve = served._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in p_serve


def test_dedup_index_roundtrip_screens_identically(prepared_spark, tmp_path):
    """Build-once/serve-many for incremental dedup: the persisted corpus
    index (exact hash map + pre-grouped LSH buckets + canonical shingles
    + sizes) must produce the EXACT same decision rows as the in-plan
    two-sided form, and the serve plan must scan the documents table
    strictly fewer times (only the incoming batch — every corpus-side
    stage is read from parquet)."""
    from collector_spark.ml.dedup import (
        dedup_index_write,
        incremental_dedup,
        incremental_dedup_from_index,
    )

    spark = prepared_spark
    idx = str(tmp_path / "dedup_index")
    audit = {r.relation: r.n_rows for r in dedup_index_write(spark, idx).collect()}
    assert audit["exact"] > 0 and audit["buckets"] > 0
    assert audit["sizes"] == spark.read.parquet(f"{idx}/shingles").select(
        "doc_id"
    ).distinct().count()

    served = incremental_dedup_from_index(spark, idx)
    inplan = incremental_dedup(spark)
    assert [tuple(r) for r in served.collect()] == [
        tuple(r) for r in inplan.collect()
    ]

    # corpus-side work absent from the serve plan: the in-plan form scans
    # the documents-backed relation for BOTH sides (5 LogicalRDD scans at
    # this fixture); the served form scans it only for the incoming batch
    # and reads the four persisted index relations as parquet instead
    p_serve = served._jdf.queryExecution().optimizedPlan().toString()
    p_inplan = inplan._jdf.queryExecution().optimizedPlan().toString()
    assert p_serve.count("LogicalRDD") < p_inplan.count("LogicalRDD")
    assert p_serve.count("Relation [") > p_inplan.count("Relation [")


# -- r12 batch additions: corpus diff + langid kappa --------------------------


def test_corpus_diff_statuses_and_conservation(prepared_spark):
    """All four statuses occur on the fixture, and the status totals
    reconcile with the two versions' cardinalities: removed+changed+
    unchanged = |v1 ∩ v2-keys ∪ v1-only| = |v1|, added+changed+unchanged
    = |v2|."""
    from collector_spark.ml.export import (
        DIFF_CURR_MOD,
        DIFF_PREV_MOD,
        corpus_diff,
    )

    spark = prepared_spark
    rows = corpus_diff(spark).collect()
    by_status = {}
    for r in rows:
        by_status[r.status] = by_status.get(r.status, 0) + r.n_docs
    assert set(by_status) == {"added", "removed", "changed", "unchanged"}
    docs = spark.table("documents")
    n1 = docs.filter(f"doc_id % {DIFF_PREV_MOD} != 0").count()
    n2 = docs.filter(f"doc_id % {DIFF_CURR_MOD} != 0").count()
    assert by_status["removed"] + by_status["changed"] + by_status["unchanged"] == n1
    assert by_status["added"] + by_status["changed"] + by_status["unchanged"] == n2


def test_langid_kappa_identities(prepared_spark):
    """kappa = (po - pe) / (1 - pe) to float precision, bounded in
    [-1, 1], and the integer pieces reconcile with the P/R table's
    marginals."""
    from collector_spark.ml.textstats import nb_langid_kappa, nb_langid_pr

    spark = prepared_spark
    k = nb_langid_kappa(spark).collect()[0]
    assert -1.0 <= k.kappa <= 1.0
    assert abs(k.kappa - (k.po - k.pe) / (1.0 - k.pe)) < 1e-12
    pr = nb_langid_pr(spark).collect()
    assert k.n == sum(r.n_true for r in pr)
    assert k.diag == sum(r.tp for r in pr)
    assert k.pe_num == sum(r.n_true * r.n_pred for r in pr)


def test_corpus_validate_counts_injected_violations(spark):
    """The fixture passes every constraint (all-zero report), so this pin
    injects one violation per constraint class into a tiny corpus and
    asserts exact counts — guarding against the checks silently
    no-oping."""
    from collector_spark.ml.export import corpus_validate

    rows = [
        (1, "ok text", "en", "web", 7),          # clean
        (1, "dup id", "en", "web", 6),           # doc_id_unique violation
        (2, "", "en", "web", 0),                 # text_not_empty + n_chars_positive
        (3, "abc", "en", "web", 99),             # n_chars_matches_text
        (4, "abcd", "EN", "web", 4),             # lang_is_iso2 (uppercase)
        (5, "abcde", "e9", "web", 5),            # lang_is_iso2 (digit)
        (6, "abcdef", "en", None, 6),            # source_not_null
        (-7, "abcdefg", "en", "web", 7),         # doc_id_non_negative
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    rep = {r.constraint_name: r for r in corpus_validate(spark, docs).collect()}
    assert all(r.n_checked == 8 for r in rep.values())
    want = {
        "doc_id_not_null": 0,
        "doc_id_non_negative": 1,
        "doc_id_unique": 1,
        "text_not_empty": 1,
        "n_chars_matches_text": 1,   # doc 3 only (doc 2's 0 == length(''))
        "n_chars_positive": 1,
        "lang_is_iso2": 2,
        "source_not_null": 1,
    }
    got = {k: r.n_violations for k, r in rep.items()}
    assert got == want, got
    assert not rep["lang_is_iso2"].passed and rep["doc_id_not_null"].passed


def test_neardup_screen_serves_identically_from_index(prepared_spark, tmp_path):
    """E130's served form (frozen corpus relations read from parquet +
    computed arrival batch) must emit the EXACT same verified pairs as
    the in-plan screen — the asymmetric rule makes the two dataflows
    identical, so parquet's exact integer round-trip closes the loop.
    The serve plan must run strictly fewer window stages (only the
    incoming side's prefix walk)."""
    from pyspark.sql import functions as F

    from collector_spark.ml.dedup import _inc_is_incoming
    from collector_spark.ml.vectors import (
        neardup_index_write,
        neardup_screen,
        neardup_screen_from_index,
    )

    spark = prepared_spark
    idx = str(tmp_path / "screen_index")
    existing = spark.table("documents").filter(~_inc_is_incoming())
    audit = {r.relation: r.n_rows for r in neardup_index_write(spark, idx, existing).collect()}
    assert audit["maxw"] > 0 and audit["index"] > 0

    served = neardup_screen_from_index(spark, idx)
    inplan = neardup_screen(spark)
    p_serve = served._jdf.queryExecution().optimizedPlan().toString()
    p_inplan = inplan._jdf.queryExecution().optimizedPlan().toString()
    assert [tuple(r) for r in served.collect()] == [
        tuple(r) for r in inplan.collect()
    ]
    assert 0 < p_serve.count("Window") < p_inplan.count("Window")


def test_blocker_recall_gates_read_one_on_fixture(prepared_spark):
    """The two r12 recall gates (frozen-index cosine screen, incremental
    LSH blocking) both measure 1.0 at every threshold on the fixture —
    the docstring/SCALE.md claim, pinned. A corpus where they read below
    1.0 is the signal to retune INDEX_DIM_CAP / LSH_BUCKET_CAP, not an
    error; this pin guards the fixture-level contract."""
    from collector_spark.ml.dedup import incremental_dedup_recall
    from collector_spark.ml.vectors import neardup_screen_recall

    for fn in (neardup_screen_recall, incremental_dedup_recall):
        rows = fn(prepared_spark).collect()
        assert rows and all(r.n_truth > 0 for r in rows)
        assert all(r.recall == 1.0 for r in rows), rows
