"""OS-metric rate/percentage kernels (state/system.go:317-381).

  A5 CPU % normalization: per-core counter deltas -> percentages of total
  A6 disk rates: delta/interval per-second rates, avg latency, utilization %

The deltas are decimal-exact (fixture sums are DECIMAL); the final division
is performed in DOUBLE on both engines from identical inputs, so results
are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collector_spark.core.diff import diff_counters, oracle_diff_sql

CPU_COUNTERS = ["user_secs", "system_secs", "idle_secs", "iowait_secs"]
DISK_COUNTERS = ["read_ops", "write_ops", "read_bytes", "write_bytes", "io_time_ms"]
INTERVAL_SECS = 60.0


def cpu_percentages(spark: SparkSession) -> DataFrame:
    d = diff_counters(spark.table("cpu_snap2"), spark.table("cpu_snap1"), ["cpu_id"], CPU_COUNTERS)
    total = None
    for c in CPU_COUNTERS:
        t = F.col(c).cast("double")
        total = t if total is None else (total + t)
    out = [F.col("cpu_id")]
    for c in CPU_COUNTERS:
        pct = F.col(c).cast("double") / F.nullif(total, F.lit(0.0)) * 100.0
        out.append(pct.alias(c.replace("_secs", "_pct")))
    return d.select(*out).orderBy("cpu_id")


def oracle_cpu_percentages() -> str:
    inner = oracle_diff_sql("cpu_snap2", "cpu_snap1", ["cpu_id"], CPU_COUNTERS)
    total = " + ".join(f"CAST({c} AS DOUBLE)" for c in CPU_COUNTERS)
    pcts = ", ".join(
        f"CAST({c} AS DOUBLE) / nullif({total}, 0.0) * 100.0 AS {c.replace('_secs', '_pct')}"
        for c in CPU_COUNTERS
    )
    return f"SELECT cpu_id, {pcts} FROM ({inner}) d ORDER BY cpu_id"


def disk_rates(spark: SparkSession) -> DataFrame:
    d = diff_counters(
        spark.table("disk_snap2"), spark.table("disk_snap1"), ["device"], DISK_COUNTERS
    )
    ops = F.col("read_ops").cast("double") + F.col("write_ops").cast("double")
    io_ms = F.col("io_time_ms").cast("double")
    return d.select(
        "device",
        (F.col("read_ops").cast("double") / INTERVAL_SECS).alias("read_ops_per_sec"),
        (F.col("write_ops").cast("double") / INTERVAL_SECS).alias("write_ops_per_sec"),
        (F.col("read_bytes").cast("double") / INTERVAL_SECS).alias("read_bytes_per_sec"),
        (F.col("write_bytes").cast("double") / INTERVAL_SECS).alias("write_bytes_per_sec"),
        (io_ms / F.nullif(ops, F.lit(0.0))).alias("avg_io_latency_ms"),
        (io_ms / (1000.0 * INTERVAL_SECS) * 100.0).alias("utilization_pct"),
    ).orderBy("device")


def oracle_disk_rates() -> str:
    inner = oracle_diff_sql("disk_snap2", "disk_snap1", ["device"], DISK_COUNTERS)
    return f"""
SELECT device,
  CAST(read_ops AS DOUBLE) / {INTERVAL_SECS} AS read_ops_per_sec,
  CAST(write_ops AS DOUBLE) / {INTERVAL_SECS} AS write_ops_per_sec,
  CAST(read_bytes AS DOUBLE) / {INTERVAL_SECS} AS read_bytes_per_sec,
  CAST(write_bytes AS DOUBLE) / {INTERVAL_SECS} AS write_bytes_per_sec,
  CAST(io_time_ms AS DOUBLE) / nullif(CAST(read_ops AS DOUBLE) + CAST(write_ops AS DOUBLE), 0.0) AS avg_io_latency_ms,
  CAST(io_time_ms AS DOUBLE) / (1000.0 * {INTERVAL_SECS}) * 100.0 AS utilization_pct
FROM ({inner}) d ORDER BY device
"""


NET_COUNTERS = ["bytes_recv", "bytes_sent"]


def net_rates(spark: SparkSession) -> DataFrame:
    """S32 (network rates): per-interface byte-counter deltas folded into
    per-second throughput (input/system/selfhosted/system.go:164-180 scan,
    state/system.go:350-355 DiffSince). The reference drops 'lo' and
    all-zero interfaces at scan time and divides the delta by the interval
    in integer math (uint64) — mirrored with an explicit floor."""
    cur = spark.table("net_snap2").filter(
        (F.col("interface") != "lo")
        & ~((F.col("bytes_recv") == 0) & (F.col("bytes_sent") == 0))
    )
    d = diff_counters(cur, spark.table("net_snap1"), ["interface"], NET_COUNTERS)
    per_sec = lambda c: F.floor(  # noqa: E731
        F.col(c).cast("double") / INTERVAL_SECS
    ).cast("long")
    return d.select(
        "interface",
        per_sec("bytes_recv").alias("receive_bytes_per_sec"),
        per_sec("bytes_sent").alias("transmit_bytes_per_sec"),
    ).orderBy("interface")


def oracle_net_rates() -> str:
    cur = (
        "SELECT * FROM net_snap2 WHERE interface <> 'lo'"
        " AND NOT (bytes_recv = 0 AND bytes_sent = 0)"
    )
    inner = oracle_diff_sql(f"({cur})", "net_snap1", ["interface"], NET_COUNTERS)
    return f"""
SELECT interface,
  CAST(FLOOR(CAST(bytes_recv AS DOUBLE) / {INTERVAL_SECS}) AS BIGINT) AS receive_bytes_per_sec,
  CAST(FLOOR(CAST(bytes_sent AS DOUBLE) / {INTERVAL_SECS}) AS BIGINT) AS transmit_bytes_per_sec
FROM ({inner}) d ORDER BY interface
"""


def load_scan(spark: SparkSession) -> DataFrame:
    """S32 (scheduler gauges): 1/5/15-minute load averages passed through
    as gauges (system.go:75-82) plus the per-core normalization the
    dashboards derive."""
    s = spark.table("load_state")
    return s.select(
        "loadavg_1min",
        "loadavg_5min",
        "loadavg_15min",
        "cpu_count",
        (F.col("loadavg_1min") / F.col("cpu_count").cast("double")).alias(
            "load_per_core_1min"
        ),
    )


def oracle_load_scan() -> str:
    return """
SELECT loadavg_1min, loadavg_5min, loadavg_15min, cpu_count,
  loadavg_1min / CAST(cpu_count AS DOUBLE) AS load_per_core_1min
FROM load_state
"""


def memory_scan(spark: SparkSession) -> DataFrame:
    """S32 (memory gauges): /proc meminfo-shaped projection
    (input/system/selfhosted/system.go:30-117) — used/available derived
    from the raw gauges; all single-row arithmetic."""
    m = spark.table("mem_state")
    used = F.col("total_bytes") - F.col("free_bytes")
    available = F.col("free_bytes") + F.col("cached_bytes") + F.col("buffers_bytes")
    return m.select(
        "total_bytes",
        "free_bytes",
        "cached_bytes",
        "buffers_bytes",
        "swap_used_bytes",
        used.alias("used_bytes"),
        available.alias("available_bytes"),
        (used.cast("double") / F.col("total_bytes").cast("double") * 100.0).alias(
            "used_pct"
        ),
    )


def oracle_memory_scan() -> str:
    return """
SELECT total_bytes, free_bytes, cached_bytes, buffers_bytes, swap_used_bytes,
  total_bytes - free_bytes AS used_bytes,
  free_bytes + cached_bytes + buffers_bytes AS available_bytes,
  CAST(total_bytes - free_bytes AS DOUBLE) / CAST(total_bytes AS DOUBLE) * 100.0 AS used_pct
FROM mem_state
"""
