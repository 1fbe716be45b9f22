#!/usr/bin/env python
"""Benchmark harness — the driver's perf surface.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints exactly ONE
JSON line on stdout:

    {"metric": "...", "value": <total-sec>, "unit": "sec",
     "queries": {"<name>": <sec>, ...}, "sf": <sf>}

Each query executes end to end via a noop-format write (full plan runs,
including final sorts; nothing is collected to the driver). A tiny warmup
query first absorbs one-time JVM/codegen startup so per-query times reflect
steady-state throughput.

r13 additions (ADDITIONS-ONLY per the harness contract — the `queries`
median dict, its keys, the timing loop and env handling are untouched):
`queries_min`/`value_min` report each query's MIN alongside the median
(min is robust against one-sided neighbor-load noise on a shared host),
and `loadavg_start`/`loadavg_end` record /proc/loadavg so a reader can
tell contended runs from quiet ones before comparing to another record.

Round-4 perf notes (r2 -> r3 regressions, bisected):
  - a2_statement_rollup +43%: the round-3 fingerprint repair/IN-collapse
    regex passes ran per joined diff row; fixed by fingerprinting once per
    DISTINCT text (statements.py) — r4 is back at the r2 level.
  - s10_relation_scan +36% / a12_bucket_accumulation +30%: the r3 fan-out
    of narrow single-row-group scans (tables.py load) adds one repartition
    exchange per widened base-table derivation so pre-shuffle render work
    parallelizes; the exchange is the measured cost at sf0.1 and does not
    exist at production scale, where inputs arrive in >= cores splits and
    the fan-out branch never fires. Partially recovered in r4 by pinning
    the shared index_rows aggregate (s11 -45%) and coalescing the pinned
    log corpus (parse/stitch/classify/stream back to r2-r3 levels).
  - u7_log_classify: the classification-enum alignment grew the rule
    chain 111 -> 115 rules with the reference's full alternations, and the
    monolithic CASE had silently exceeded the codegen method limit all
    along (interpreted evaluation). Splitting classification and detail
    extraction into coalesces of ~16-rule sub-chains restored whole-stage
    codegen: 5.0 s (r3) -> 3.7 s with MORE rules.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# the sf0.1 headliners measurably benefit from the larger heap (r10:
# 0.74-0.80x vs the 1g-era runs); pin it here rather than raising the
# library-wide default
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline queries: the flagship statement pipeline, the log pipeline's
# hottest stages, the relation megascan, snapshot + activity assembly, the
# streaming stitcher run-to-completion, and the heaviest training-data
# extension operators
HEADLINE = [
    "a1_statement_diff",
    "a2_statement_rollup",
    "snapshot_statement_fact",
    "activity_snapshot",
    "s10_relation_scan",
    "s13_relations_schema",
    "log_parse",
    "w3_log_stitch",
    "u7_log_classify",
    "a12_bucket_accumulation",
    "st3_stream_stitch",
    "ml_minhash_candidate_pairs",
    "ml_ngram_jaccard",
    "ml_brute_force_topk",
    "ml_ivf_topk",
    "ml_repetition_signals",
    "tr_heroku_items",
    # round-4 additions: the window-hash span dedup (the heaviest new
    # training-data op) and the 53-group autovacuum vector (the heaviest
    # new regex extraction)
    "ml_ngram_span_dedup",
    "u7w_autovacuum_full",
    # round-9 additions: the incremental cross-batch screen (the new dedup
    # family's flagship, exact + cross-side LSH + verify in one plan) and
    # the SQ8 compressed-index ANN (ADC shortlist + exact rerank)
    "ml_incremental_dedup",
    "ml_ivf_sq8_topk",
    # round-9 session-2 additions: the Kneser-Ney bigram LM (the heaviest
    # new model-scoring join tree) and the Bloom pre-screen (the sketch
    # path: bitset build + broadcast probe + truth audit)
    "ml_kneser_ney_bigram",
    "ml_bloom_screen",
    # round-10 additions: corpus line dedup (the heaviest new line-wise
    # shuffle: F27 explode + corpus-wide first-owner window) and the BPE
    # encoder (trainer + application in one linear checkpointed plan)
    "ml_line_dedup",
    "ml_bpe_encode",
    # round-10 session-5 additions: the prefix-filtered hashed-TF near-dup
    # join (blocking + capped pair expansion + integer verify in one plan)
    # and the source TVD matrix (token self-join shuffling on the term)
    "ml_hashed_tf_neardup",
    "ml_source_tvd",
    # round-10 session-6 additions: the per-source boilerplate strip (the
    # line-fold + flag + audit join-back chain) and the perceptual-hash
    # media near-dup (row-local fingerprint + pigeonhole banding)
    "ml_boilerplate_lines",
    "mm_phash_neardup",
    # round-11 additions: the classifier ROC curve (the heaviest new
    # evaluation plan — E113's margin scoring + the bounded bin fold) and
    # the duplicate-n-gram corpus-health metric (the heaviest new shuffle:
    # shingle explode + two h-keyed folds + co-partitioned join)
    "ml_quality_roc",
    "ml_dup_ngram_fraction",
    # round-12 additions (headliner policy: <=3/round): the full §3.2 log
    # lifecycle composed end to end — parse -> stitch -> classify -> redact
    # -> compact-log fact — as a batch plan and as ONE streaming query
    # (stateful sessionizer + stateless classify/redact in-stream, per-tick
    # assembly over the closed window); the pair prices the streaming
    # machinery against the identical batch composition
    "log_pipeline_full",
    "st_log_pipeline_full",
]

N_RUNS = 3  # median-of-3 per query
SINGLE_RUN: set[str] = set()


def _loadavg() -> list[float]:
    """1/5/15-minute load averages — emitted in the JSON line so a reader
    can tell contended runs from quiet ones (r12 verdict: external neighbor
    load on this shared host swings single queries 3-4x; numbers without
    load context are not comparable)."""
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except (OSError, ValueError):
        return []


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return -1.0


def main() -> int:
    from collector_spark import registry
    from collector_spark.session import get_spark

    loadavg_start = _loadavg()

    registry.load_all()
    spark = get_spark("collector_spark_bench")
    registry.prepare(spark, SF_DIR)

    # warmup: force JVM/codegen/parquet-footer startup off the clock
    spark.table("lineitem").limit(1000).write.mode("overwrite").format("noop").save()

    # materialize the raw log source once, as a production pipeline would
    # (the fixture derives it from events; a real deployment reads files).
    # Parsing/stitching/classification — the engine's work — stays on the
    # clock.
    spark.sql("CACHE TABLE log_raw")
    spark.table("log_raw").write.mode("overwrite").format("noop").save()

    names = [n for n in HEADLINE if n in registry.REGISTRY]
    timings: dict[str, float] = {}
    # additions-only (r12 verdict item 2): per-query MIN emitted alongside
    # the median — min is robust against one-sided contention noise, so a
    # reader can separate structural regressions from neighbor load. The
    # `queries` dict (the comparison surface) stays median-of-3, unchanged.
    timings_min: dict[str, float] = {}
    for name in names:
        q = registry.REGISTRY[name]
        runs = []
        for _ in range(1 if name in SINGLE_RUN else N_RUNS):
            t0 = time.perf_counter()
            q.spark_fn(spark).write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[len(runs) // 2], 3)
        timings_min[name] = round(min(runs), 3)

    # r11 headliner: the END-TO-END curation pipeline ACTION — dedup +
    # quality keep-lists -> manifest -> the real source-partitioned,
    # size-capped parquet write -> read-back audit (ml/export.py). This is
    # the wall-clock a production user pays per export run; the write is
    # real parquet (the sink IS the operator), only the audit result sinks
    # to noop.
    import shutil
    import tempfile

    runs = []
    for _ in range(N_RUNS):
        out_dir = tempfile.mkdtemp(prefix="bench_export_")
        try:
            from collector_spark.ml.export import export_corpus

            t0 = time.perf_counter()
            export_corpus(spark, out_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            runs.append(time.perf_counter() - t0)
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
    timings["pipeline_export_corpus"] = round(sorted(runs)[len(runs) // 2], 3)
    timings_min["pipeline_export_corpus"] = round(min(runs), 3)

    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
        "queries_min": timings_min,
        "value_min": round(sum(timings_min.values()), 3),
        "loadavg_start": loadavg_start,
        "loadavg_end": _loadavg(),
    }
    shared = _shared_vs_records(timings)
    if shared:
        out["shared"] = shared
    print(json.dumps(out))
    return 0


def _shared_vs_records(timings: dict[str, float]) -> dict:
    """Headliner-policy comparables (README 'Bench headliner policy'):
    the set grows every round, so the round-over-round number is computed
    over the INTERSECTION with the most recent recorded round, and the
    long-horizon number over the intersection with the earliest full
    record — emitted here so the comparison is computed, not hand-derived
    from the records after the fact."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    recs = []
    for path in sorted(
        glob.glob(os.path.join(here, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    ):
        try:
            with open(path) as f:
                rec = json.load(f)
            # driver records wrap the emitted line under "parsed"
            q = (rec.get("parsed") or rec).get("queries") or {}
        except (OSError, ValueError, AttributeError):
            continue
        if q:
            recs.append((path, q))
    out: dict = {}
    for label, item in (
        ("prev", recs[-1] if recs else None),
        ("first", recs[0] if recs else None),
    ):
        if item is None:
            continue
        path, prev_q = item
        names = sorted(set(prev_q) & set(timings))
        if not names:
            continue
        now_s = round(sum(timings[n] for n in names), 3)
        rec_s = round(sum(prev_q[n] for n in names), 3)
        out[label] = {
            "vs": os.path.basename(path),
            "n": len(names),
            "now_sec": now_s,
            "recorded_sec": rec_s,
            "ratio": round(now_s / rec_s, 3) if rec_s else None,
        }
    return out


if __name__ == "__main__":
    sys.exit(main())
