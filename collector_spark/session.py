"""SparkSession factory.

Local test rig: one JVM, ``local[N]`` threads. At production scale the same
builder config applies per-executor; the scale-sensitive knobs are called out
inline. Everything here is plain public Spark configuration.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "collector_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Scale notes (100 TB / 1000 executors):
      - AQE stays on: it coalesces post-shuffle partitions and splits skewed
        ones at runtime (hot query fingerprints / hot backend pids are the
        skew sources in this workload).
      - ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound; at
        cluster scale set it ~2-3x total cores and let AQE coalesce.
      - Arrow is on for every Pandas-UDF boundary (classifier, sessionizer).
      - Timezone pinned UTC: the reference parses log timestamps in the
        server's ``log_timezone``; we normalize to UTC at ingest.
    """
    cpus = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.appName(app_name)
        # local mode runs driver AND executors in one JVM whose heap
        # defaults to 1g — the root cause of the recurring late-suite
        # "memory pressure" flakes (broadcast-build failures, executor
        # heap OOM in the stress legs after ~550 tests of accumulated
        # caches). Only effective for the process's FIRST JVM launch,
        # which is true for every in-repo entry point; the driver's own
        # harness builds its session itself and is unaffected. The
        # default stays modest (4g) so constrained hosts can still
        # launch; the full test suite — the one place the flakes were
        # observed — pins 8g via the env override in tests/conftest.py.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g")
        )
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if not os.environ.get("SPARK_GRAFT_NO_MASTER"):
        builder = builder.master(f"local[{DEFAULT_SHUFFLE_PARTITIONS}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
