"""collector_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of pganalyze/collector (the reference).

The reference is a PostgreSQL observability agent built around four dataflow
pipelines (metrics snapshot diffing, high-frequency query stats, log
analytics, activity sampling — see SURVEY.md). This package re-expresses
every operator Spark-first: declarative DataFrame/SQL plans optimized by
Catalyst, Structured Streaming for the log pipeline, and Pandas UDFs only
where built-in functions genuinely cannot express the semantics.

Layout:
    session    — SparkSession factory tuned for the local[32] test rig and
                 documented knobs for 1000-executor scale.
    tables     — typed loaders for the synthetic test tables.
    fixtures   — deterministic derivations of the reference's input shapes
                 (statement stats, backends, log lines, ...) from the
                 synthetic tables, mirrored exactly in DuckDB SQL for the
                 correctness oracle.
    core       — reusable kernels: counter diff (with reset semantics),
                 dense-index dimension builder.
    operators  — the reference's scan/aggregation operator inventory
                 (SURVEY.md §2) as DataFrame programs.
    logs       — the log-analytics pipeline: prefix compiler, parser,
                 stitcher, secondary association, classifier, redaction.
    functions  — scalar function surface (fingerprint, normalize, ...).
    ml         — large-scale training-data extensions: dedup, similarity
                 search, text analysis, multimodal plumbing.
    streaming  — Structured Streaming wrappers (watermarks, sessionization,
                 tumbling stat buckets).
"""

__version__ = "0.1.0"
