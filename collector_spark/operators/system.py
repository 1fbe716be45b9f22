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


# ---------------------------------------------------------------------------
# S32 (RDS enhanced monitoring): the CloudWatch RDSOSMetrics log event — a
# nested-JSON OS snapshot per instance — decoded and mapped exactly as
# input/system/rds/system.go:139-250 does from the enhanced_monitoring.go
# struct: cpu percents pass through (DiffedOnInput), memory kilobyte fields
# scale x1024, swap_used = total - free, and the rdsdev disk entry is found
# by scanning the diskIO array for its device name, not by position.
# ---------------------------------------------------------------------------

RDS_OS_SCHEMA = """
    numVCPUs int,
    cpuUtilization struct<guest double, idle double, irq double, nice double,
                          steal double, system double, total double,
                          user double, wait double>,
    loadAverageMinute struct<one double, five double, fifteen double>,
    memory struct<active long, buffers long, cached long, dirty long,
                  free long, hugePagesFree long, hugePagesRsvd long,
                  hugePagesSize long, hugePagesSurp long, hugePagesTotal long,
                  inactive long, mapped long, pageTables long, slab long,
                  total long, writeback long>,
    swap struct<total long, free long, cached long>,
    network array<struct<interface string, rx double, tx double>>,
    diskIO array<struct<device string, util double, readIOsPS double,
                        writeIOsPS double>>,
    fileSys array<struct<mountPoint string, name string, total long,
                         used long, usedPercent double>>
"""


def rds_enhanced_scan(spark: SparkSession) -> DataFrame:
    """Per-instance OS metrics from the enhanced-monitoring JSON event.
    Map-only: from_json with an explicit nested schema (column pruning
    reaches inside the struct), the rdsdev utilization via a filter() over
    the parsed array — no explode, no shuffle. Instances without a swap
    section (MonitoringInterval edge) surface NULL swap bytes, matching the
    reference's absent-field zero-value distinction."""
    ev = spark.table("rds_os_events")
    j = F.from_json(F.col("message"), RDS_OS_SCHEMA)
    mem = j["memory"]
    rdsdev = F.filter(j["diskIO"], lambda d: d["device"] == F.lit("rdsdev"))
    kb = lambda c: (c * 1024).cast("long")  # noqa: E731
    return ev.select(
        "instance_id",
        j["numVCPUs"].alias("logical_core_count"),
        j["cpuUtilization"]["user"].alias("cpu_user_pct"),
        j["cpuUtilization"]["system"].alias("cpu_system_pct"),
        j["cpuUtilization"]["idle"].alias("cpu_idle_pct"),
        j["cpuUtilization"]["wait"].alias("cpu_iowait_pct"),
        j["cpuUtilization"]["irq"].alias("cpu_irq_pct"),
        j["cpuUtilization"]["nice"].alias("cpu_nice_pct"),
        j["cpuUtilization"]["steal"].alias("cpu_steal_pct"),
        j["cpuUtilization"]["guest"].alias("cpu_guest_pct"),
        j["loadAverageMinute"]["one"].alias("loadavg_1min"),
        j["loadAverageMinute"]["five"].alias("loadavg_5min"),
        j["loadAverageMinute"]["fifteen"].alias("loadavg_15min"),
        kb(mem["total"]).alias("memory_total_bytes"),
        kb(mem["free"]).alias("memory_free_bytes"),
        kb(mem["cached"]).alias("memory_cached_bytes"),
        kb(mem["buffers"]).alias("memory_buffers_bytes"),
        kb(mem["dirty"]).alias("memory_dirty_bytes"),
        kb(mem["active"]).alias("memory_active_bytes"),
        kb(mem["inactive"]).alias("memory_inactive_bytes"),
        kb(mem["mapped"]).alias("memory_mapped_bytes"),
        kb(mem["pageTables"]).alias("memory_page_tables_bytes"),
        kb(mem["slab"]).alias("memory_slab_bytes"),
        kb(mem["writeback"]).alias("memory_writeback_bytes"),
        mem["hugePagesTotal"].alias("huge_pages_total"),
        mem["hugePagesFree"].alias("huge_pages_free"),
        kb(j["swap"]["total"]).alias("swap_total_bytes"),
        kb(j["swap"]["total"] - j["swap"]["free"]).alias("swap_used_bytes"),
        F.element_at(j["network"], 1)["interface"].alias("network_interface"),
        F.element_at(rdsdev, 1)["util"].alias("data_disk_utilization_pct"),
    ).orderBy("instance_id")


def oracle_rds_enhanced_scan() -> str:
    x = lambda p: f"json_extract(message, '$.{p}')"  # noqa: E731
    d = lambda p, a: f"CAST({x(p)} AS DOUBLE) AS {a}"  # noqa: E731
    kb = lambda p, a: f"CAST({x(p)} AS BIGINT) * 1024 AS {a}"  # noqa: E731
    l = lambda p, a: f"CAST({x(p)} AS BIGINT) AS {a}"  # noqa: E731
    # the 2-entry fixture array: position of rdsdev alternates; the general
    # device-name scan is the Spark-side filter() — here a positional CASE
    # expresses the same lookup over the fixture shape
    rdsdev = (
        "CASE WHEN json_extract_string(message, '$.diskIO[0].device') = 'rdsdev'"
        f" THEN CAST({x('diskIO[0].util')} AS DOUBLE)"
        f" ELSE CAST({x('diskIO[1].util')} AS DOUBLE) END"
    )
    return f"""
SELECT instance_id,
  CAST({x('numVCPUs')} AS INT) AS logical_core_count,
  {d('cpuUtilization.user', 'cpu_user_pct')},
  {d('cpuUtilization.system', 'cpu_system_pct')},
  {d('cpuUtilization.idle', 'cpu_idle_pct')},
  {d('cpuUtilization.wait', 'cpu_iowait_pct')},
  {d('cpuUtilization.irq', 'cpu_irq_pct')},
  {d('cpuUtilization.nice', 'cpu_nice_pct')},
  {d('cpuUtilization.steal', 'cpu_steal_pct')},
  {d('cpuUtilization.guest', 'cpu_guest_pct')},
  {d('loadAverageMinute.one', 'loadavg_1min')},
  {d('loadAverageMinute.five', 'loadavg_5min')},
  {d('loadAverageMinute.fifteen', 'loadavg_15min')},
  {kb('memory.total', 'memory_total_bytes')},
  {kb('memory.free', 'memory_free_bytes')},
  {kb('memory.cached', 'memory_cached_bytes')},
  {kb('memory.buffers', 'memory_buffers_bytes')},
  {kb('memory.dirty', 'memory_dirty_bytes')},
  {kb('memory.active', 'memory_active_bytes')},
  {kb('memory.inactive', 'memory_inactive_bytes')},
  {kb('memory.mapped', 'memory_mapped_bytes')},
  {kb('memory.pageTables', 'memory_page_tables_bytes')},
  {kb('memory.slab', 'memory_slab_bytes')},
  {kb('memory.writeback', 'memory_writeback_bytes')},
  {l('memory.hugePagesTotal', 'huge_pages_total')},
  {l('memory.hugePagesFree', 'huge_pages_free')},
  {kb('swap.total', 'swap_total_bytes')},
  (CAST({x('swap.total')} AS BIGINT) - CAST({x('swap.free')} AS BIGINT)) * 1024 AS swap_used_bytes,
  json_extract_string(message, '$.network[0].interface') AS network_interface,
  {rdsdev} AS data_disk_utilization_pct
FROM rds_os_events
ORDER BY instance_id
"""


def rds_partitions_scan(spark: SparkSession) -> DataFrame:
    """The fileSys array exploded to disk partitions (system.go:236-250):
    one row per (instance, mount point) with kilobyte fields scaled to
    bytes — the DiskPartitionMap the snapshot carries."""
    ev = spark.table("rds_os_events")
    j = F.from_json(F.col("message"), RDS_OS_SCHEMA)
    fs = ev.select(
        "instance_id", F.explode(j["fileSys"]).alias("f")
    )
    return fs.select(
        "instance_id",
        F.col("f")["mountPoint"].alias("mount_point"),
        F.col("f")["name"].alias("partition_name"),
        (F.col("f")["used"] * 1024).cast("long").alias("used_bytes"),
        (F.col("f")["total"] * 1024).cast("long").alias("total_bytes"),
        F.col("f")["usedPercent"].alias("used_percent"),
    ).orderBy("instance_id", "mount_point")


def oracle_rds_partitions_scan() -> str:
    def one(i: int) -> str:
        x = lambda p: f"json_extract(message, '$.fileSys[{i}].{p}')"  # noqa: E731
        return f"""
SELECT instance_id,
  json_extract_string(message, '$.fileSys[{i}].mountPoint') AS mount_point,
  json_extract_string(message, '$.fileSys[{i}].name') AS partition_name,
  CAST({x('used')} AS BIGINT) * 1024 AS used_bytes,
  CAST({x('total')} AS BIGINT) * 1024 AS total_bytes,
  CAST({x('usedPercent')} AS DOUBLE) AS used_percent
FROM rds_os_events"""

    return f"""
SELECT * FROM ({one(0)} UNION ALL {one(1)})
ORDER BY instance_id, mount_point
"""


# ---------------------------------------------------------------------------
# S32 (Crunchy Bridge): cluster metrics via the Bridge API
# (input/system/crunchy_bridge/client.go:120-265, system.go:12-134). The
# reference reduces each metric series with a NaN-skipping average, then
# derives: idle% = 100 - iowait - system - user - steal (system.go:57),
# memory/swap bytes = pct of the cluster's memory budget, disk totals from
# the storage budget, and the effective cluster id prefers the parent.
# ---------------------------------------------------------------------------

_CB_SERIES = (
    "cpu_load_iowait", "cpu_load_system", "cpu_load_user", "cpu_load_steal",
    "load_average_one", "memory_used_pct", "swap_used_pct",
    "iops_reads", "iops_writes", "database_size_bytes", "wal_size_bytes",
)


def crunchy_bridge_scan(spark: SparkSession) -> DataFrame:
    """One shuffle: groupBy(cluster) with conditional AVG per series (AVG
    skips NULL points exactly as the reference's average() skips NaN;
    map-side combinable sum/count partials), then a broadcast join against
    the 8-row cluster-info dimension for the budget-derived byte values."""
    pts = spark.table("cb_metric_points")
    aggs = [
        F.avg(F.when(F.col("series_name") == s, F.col("value"))).alias(s)
        for s in _CB_SERIES
    ]
    series = pts.groupBy("cluster_id").agg(*aggs)
    info = F.broadcast(spark.table("cb_cluster_info"))
    j = series.join(info, "cluster_id")
    mem_total = (F.col("memory_gb").cast("long") * 1024 * 1024 * 1024)
    disk_total = (F.col("storage_gb").cast("long") * 1024 * 1024 * 1024)
    to_bytes = lambda pct: F.floor(  # noqa: E731
        mem_total.cast("double") * pct / 100.0
    ).cast("long")
    return j.select(
        "cluster_id",
        F.coalesce("parent_id", "cluster_id").alias("effective_cluster_id"),
        "cluster_name",
        "plan_id",
        "provider_id",
        "region_id",
        F.col("cpu_units").alias("logical_core_count"),
        F.col("cpu_load_user").alias("cpu_user_pct"),
        F.col("cpu_load_system").alias("cpu_system_pct"),
        F.col("cpu_load_iowait").alias("cpu_iowait_pct"),
        F.col("cpu_load_steal").alias("cpu_steal_pct"),
        (
            F.lit(100.0)
            - F.col("cpu_load_iowait")
            - F.col("cpu_load_system")
            - F.col("cpu_load_user")
            - F.col("cpu_load_steal")
        ).alias("cpu_idle_pct"),
        F.col("load_average_one").alias("loadavg_1min"),
        mem_total.alias("memory_total_bytes"),
        to_bytes(F.col("memory_used_pct")).alias("memory_application_bytes"),
        to_bytes(F.col("swap_used_pct")).alias("swap_used_bytes"),
        F.col("iops_reads").alias("disk_read_ops_per_sec"),
        F.col("iops_writes").alias("disk_write_ops_per_sec"),
        F.floor("database_size_bytes").cast("long").alias("data_used_bytes"),
        disk_total.alias("data_total_bytes"),
        F.floor("wal_size_bytes").cast("long").alias("xlog_used_bytes"),
    ).orderBy("cluster_id")


def oracle_crunchy_bridge_scan() -> str:
    avgs = ",\n  ".join(
        f"AVG(CASE WHEN series_name = '{s}' THEN value END) AS {s}"
        for s in _CB_SERIES
    )
    return f"""
WITH series AS (
  SELECT cluster_id, {avgs}
  FROM cb_metric_points GROUP BY cluster_id
),
j AS (SELECT * FROM series JOIN cb_cluster_info USING (cluster_id))
SELECT cluster_id,
  COALESCE(parent_id, cluster_id) AS effective_cluster_id,
  cluster_name, plan_id, provider_id, region_id,
  cpu_units AS logical_core_count,
  cpu_load_user   AS cpu_user_pct,
  cpu_load_system AS cpu_system_pct,
  cpu_load_iowait AS cpu_iowait_pct,
  cpu_load_steal  AS cpu_steal_pct,
  100.0 - cpu_load_iowait - cpu_load_system - cpu_load_user - cpu_load_steal
    AS cpu_idle_pct,
  load_average_one AS loadavg_1min,
  CAST(memory_gb AS BIGINT) * 1024 * 1024 * 1024 AS memory_total_bytes,
  CAST(FLOOR(CAST(CAST(memory_gb AS BIGINT) * 1024 * 1024 * 1024 AS DOUBLE)
       * memory_used_pct / 100.0) AS BIGINT) AS memory_application_bytes,
  CAST(FLOOR(CAST(CAST(memory_gb AS BIGINT) * 1024 * 1024 * 1024 AS DOUBLE)
       * swap_used_pct / 100.0) AS BIGINT) AS swap_used_bytes,
  iops_reads  AS disk_read_ops_per_sec,
  iops_writes AS disk_write_ops_per_sec,
  CAST(FLOOR(database_size_bytes) AS BIGINT) AS data_used_bytes,
  CAST(storage_gb AS BIGINT) * 1024 * 1024 * 1024 AS data_total_bytes,
  CAST(FLOOR(wal_size_bytes) AS BIGINT) AS xlog_used_bytes
FROM j
ORDER BY cluster_id
"""


# ---------------------------------------------------------------------------
# S32 (Azure Database): server metrics via Azure Monitor
# (input/system/azure/system.go:18-283). One 1-minute average per metric;
# the disk family exists only for Flexible Server (gated on resourceType);
# network byte counters are 1-minute totals divided to per-second; the
# storage partition budget comes from StorageGB (Flexible) or
# CoordinatorStorageMB (Cosmos DB); replicas report the source server as
# their cluster identity.
# ---------------------------------------------------------------------------

_AZ_METRICS = (
    "cpu_percent", "memory_percent", "network_bytes_egress",
    "network_bytes_ingress", "storage_used", "txlogs_storage_used",
    "read_iops", "write_iops", "disk_queue_depth", "read_throughput",
    "write_throughput",
)


def azure_system_scan(spark: SparkSession) -> DataFrame:
    """Pivot the per-server metric values (MAX over the single row per
    name — one shuffle, map-side combinable) and broadcast-join the 8-row
    server-info dimension for type gating and budget-derived partitions."""
    m = spark.table("az_metric_values")
    aggs = [
        F.max(F.when(F.col("metric_name") == n, F.col("avg_value"))).alias(n)
        for n in _AZ_METRICS
    ]
    series = m.groupBy("server_name").agg(*aggs)
    info = F.broadcast(spark.table("az_server_info"))
    j = series.join(info, "server_name")
    is_flex = F.lower(F.col("resource_type")) == "flexibleservers"
    per_sec = lambda c: F.floor(F.col(c) / 60.0).cast("long")  # noqa: E731
    return j.select(
        "server_name",
        F.concat_ws(
            "/",
            F.coalesce("source_resource_group", "resource_group"),
            F.coalesce("source_server_name", "server_name"),
        ).alias("cluster_id"),
        "resource_type",
        "sku_name",
        "availability_zone",
        "ha_mode",
        F.col("cpu_percent").alias("cpu_user_pct"),
        F.col("memory_percent").alias("memory_used_pct"),
        per_sec("network_bytes_egress").alias("net_transmit_bytes_per_sec"),
        per_sec("network_bytes_ingress").alias("net_receive_bytes_per_sec"),
        F.when(is_flex, F.floor("txlogs_storage_used").cast("long")).alias(
            "xlog_used_bytes"
        ),
        F.when(is_flex, F.col("read_iops")).alias("disk_read_ops_per_sec"),
        F.when(is_flex, F.col("write_iops")).alias("disk_write_ops_per_sec"),
        F.when(is_flex, F.floor("disk_queue_depth").cast("int")).alias(
            "disk_avg_queue_size"
        ),
        F.when(is_flex, F.col("read_throughput")).alias("disk_read_bytes_per_sec"),
        F.when(is_flex, F.col("write_throughput")).alias(
            "disk_write_bytes_per_sec"
        ),
        F.floor("storage_used").cast("long").alias("data_used_bytes"),
        F.when(is_flex, F.col("storage_gb").cast("long") * 1024 * 1024 * 1024)
        .otherwise(F.col("coordinator_storage_mb").cast("long") * 1024 * 1024)
        .alias("data_total_bytes"),
    ).orderBy("server_name")


def oracle_azure_system_scan() -> str:
    aggs = ",\n  ".join(
        f"MAX(CASE WHEN metric_name = '{n}' THEN avg_value END) AS {n}"
        for n in _AZ_METRICS
    )
    flex = "lower(resource_type) = 'flexibleservers'"
    return f"""
WITH series AS (
  SELECT server_name, {aggs}
  FROM az_metric_values GROUP BY server_name
),
j AS (SELECT * FROM series JOIN az_server_info USING (server_name))
SELECT server_name,
  COALESCE(source_resource_group, resource_group) || '/' ||
    COALESCE(source_server_name, server_name) AS cluster_id,
  resource_type, sku_name, availability_zone, ha_mode,
  cpu_percent AS cpu_user_pct,
  memory_percent AS memory_used_pct,
  CAST(FLOOR(network_bytes_egress / 60.0) AS BIGINT) AS net_transmit_bytes_per_sec,
  CAST(FLOOR(network_bytes_ingress / 60.0) AS BIGINT) AS net_receive_bytes_per_sec,
  CASE WHEN {flex} THEN CAST(FLOOR(txlogs_storage_used) AS BIGINT) END AS xlog_used_bytes,
  CASE WHEN {flex} THEN read_iops END AS disk_read_ops_per_sec,
  CASE WHEN {flex} THEN write_iops END AS disk_write_ops_per_sec,
  CASE WHEN {flex} THEN CAST(FLOOR(disk_queue_depth) AS INT) END AS disk_avg_queue_size,
  CASE WHEN {flex} THEN read_throughput END AS disk_read_bytes_per_sec,
  CASE WHEN {flex} THEN write_throughput END AS disk_write_bytes_per_sec,
  CAST(FLOOR(storage_used) AS BIGINT) AS data_used_bytes,
  CASE WHEN {flex} THEN CAST(storage_gb AS BIGINT) * 1024 * 1024 * 1024
       ELSE CAST(coordinator_storage_mb AS BIGINT) * 1024 * 1024 END AS data_total_bytes
FROM j
ORDER BY server_name
"""


# ---------------------------------------------------------------------------
# S32 (Tembo Cloud): instance metrics via five Prometheus instant queries
# (input/system/tembo/system.go:40-126). Each response carries at most one
# vector sample; the reference takes result[0].value[1] (a string), parses
# it, and treats an EMPTY result vector as 0 (system.go:139-147, :158-166).
# Derived values mirror GetSystemState exactly, including its quirk of
# publishing the "/" partition with TotalBytes = diskAvailable (NOT
# capacity; system.go:113-118) — behavior over intuition.
# ---------------------------------------------------------------------------

_TEMBO_KINDS = (
    "cpu_usage", "memory_total", "memory_available",
    "disk_capacity", "disk_available",
)


def tembo_system_scan(spark: SparkSession) -> DataFrame:
    """One shuffle: groupBy(namespace) pivots the five metric kinds
    (map-side combinable MAX partials); the JSON probe is a pruned
    get_json_object path, no explode. Missing samples COALESCE to the
    reference's zero defaults."""
    r = spark.table("tembo_metric_responses")
    v = F.get_json_object(F.col("body"), "$.data.result[0].value[1]")
    parsed = r.select("namespace", "kind", v.alias("v"))
    agg = lambda k: F.max(F.when(F.col("kind") == k, F.col("v")))  # noqa: E731
    s = parsed.groupBy("namespace").agg(
        F.coalesce(agg("cpu_usage").cast("double"), F.lit(0.0)).alias("cpu"),
        F.coalesce(agg("memory_total").cast("long"), F.lit(0).cast("long")).alias("mt"),
        F.coalesce(agg("memory_available").cast("long"), F.lit(0).cast("long")).alias("ma"),
        F.coalesce(agg("disk_capacity").cast("long"), F.lit(0).cast("long")).alias("dc"),
        F.coalesce(agg("disk_available").cast("long"), F.lit(0).cast("long")).alias("da"),
    )
    return s.select(
        "namespace",
        F.col("cpu").alias("cpu_user_pct"),
        F.col("mt").alias("memory_total_bytes"),
        F.col("ma").alias("memory_available_bytes"),
        F.col("ma").alias("memory_free_bytes"),
        (F.col("dc") - F.col("da")).alias("data_directory_used_bytes"),
        F.col("da").alias("data_directory_total_bytes"),
    ).orderBy("namespace")


def oracle_tembo_system_scan() -> str:
    probe = "json_extract_string(body, '$.data.result[0].value[1]')"
    agg = lambda k: f"MAX(CASE WHEN kind = '{k}' THEN v END)"  # noqa: E731
    return f"""
WITH parsed AS (
  SELECT namespace, kind, {probe} AS v FROM tembo_metric_responses
),
s AS (
  SELECT namespace,
    COALESCE(CAST({agg('cpu_usage')} AS DOUBLE), 0.0) AS cpu,
    COALESCE(CAST({agg('memory_total')} AS BIGINT), 0) AS mt,
    COALESCE(CAST({agg('memory_available')} AS BIGINT), 0) AS ma,
    COALESCE(CAST({agg('disk_capacity')} AS BIGINT), 0) AS dc,
    COALESCE(CAST({agg('disk_available')} AS BIGINT), 0) AS da
  FROM parsed GROUP BY namespace
)
SELECT namespace,
  cpu AS cpu_user_pct,
  mt AS memory_total_bytes,
  ma AS memory_available_bytes,
  ma AS memory_free_bytes,
  dc - da AS data_directory_used_bytes,
  da AS data_directory_total_bytes
FROM s
ORDER BY namespace
"""
