"""Full-snapshot star-schema breadth: relation/index, system, backend,
replication, and function dims + facts (SURVEY §2 snapshot emit).

Reference: the FullSnapshot transform family —
  output/transform/postgres_relations.go:1-324  (RelationReferences /
      RelationInformations / RelationStatistics incl. the buffer-cache
      cached-bytes merge, IndexReferences / IndexInformations /
      IndexStatistics)
  output/transform/system.go:32-356             (CPU / network / disk
      references + statistics, sorted-name dense idx)
  output/transform/postgres_backends.go:9-61    (Backend rows)
  output/transform/postgres_replication.go:9-93 (Standby references /
      informations / statistics, -1 byte-lag defaults)
  output/transform/postgres_functions.go:8-74   (FunctionReferences /
      Informations / Statistics)

The protobuf's parallel arrays (reference list + info list + statistic
list, linked by dense int32 idx) flatten here into ONE fact row per member
carrying its dense idx — the star schema a warehouse consumer would
actually query; the reference's insertion-order idx assignment becomes a
global sorted rank (deterministic and order-insensitive, core/dims.py).

Scale: every dimension here is bounded per server (relations are capped,
backends are O(max_connections), hardware components are O(cores/disks)),
so dim joins broadcast; the facts ride the already-shuffled upstream scans
(S10/S11/A5/A6/A6b/S26/A8) without new wide exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collector_spark.core.dims import dense_index
from collector_spark.core.pinned import pinned
from collector_spark.operators import relation_scan as rs
from collector_spark.operators import system as sysops
from collector_spark.operators.functions_stats import (
    function_diff,
    oracle_function_diff,
)
from collector_spark.operators.replication import oracle_standby_lag, standby_lag


def _strip_order(sql: str) -> str:
    return sql.rsplit("ORDER BY", 1)[0]


# ---------------------------------------------------------------------------
# Relation dim shared by the relation and index facts: scanned oids (S10,
# locked placeholders included — postgres_relations.go:12-21 appends a
# RelationReference for every relation, locked or not) joined to their
# pg_class names, with the dense sorted-rank relation_idx.
# ---------------------------------------------------------------------------


def _relations_with_idx(spark: SparkSession) -> DataFrame:
    scan = pinned(spark, "snapshot_relation_scan", lambda: rs.relation_scan(spark))
    names = spark.table("class_rows").select(
        "oid",
        F.col("nspname").alias("schema_name"),
        F.col("relname").alias("relation_name"),
        F.col("relkind").alias("relation_type"),
        "parent_oid",
    )
    base = scan.join(F.broadcast(names), on="oid", how="inner")
    dim = dense_index(base, ["schema_name", "relation_name"], "relation_idx")
    return base.join(F.broadcast(dim), on=["schema_name", "relation_name"])


_SQL_RELATIONS_WITH_IDX_TEMPLATE = """
scan AS ({scan}),
names AS (
  SELECT oid, nspname AS schema_name, relname AS relation_name,
         relkind AS relation_type, parent_oid
  FROM class_rows
),
base AS (SELECT s.*, n.schema_name, n.relation_name, n.relation_type, n.parent_oid
         FROM scan s JOIN names n USING (oid)),
dim AS (
  SELECT schema_name, relation_name,
    CAST(row_number() OVER (ORDER BY schema_name, relation_name) - 1 AS INT)
      AS relation_idx
  FROM (SELECT DISTINCT schema_name, relation_name FROM base)
),
withidx AS (SELECT b.*, d.relation_idx FROM base b
            JOIN dim d USING (schema_name, relation_name)),
cached AS (
  SELECT relfilenode, CAST(SUM(block_bytes) AS BIGINT) AS cached_bytes
  FROM buffercache_rows GROUP BY relfilenode
)
"""


def _sql_relations_with_idx() -> str:
    return _SQL_RELATIONS_WITH_IDX_TEMPLATE.format(
        scan=_strip_order(rs.oracle_relation_scan())
    )


_REL_STAT_COLS = rs.STAT_COLS + [
    "idx_scan",
    "idx_tup_fetch",
    "idx_blks_read",
    "idx_blks_hit",
    "relation_xid_age",
    "relation_mxid_age",
    "relpages",
    "reltuples",
    "relallvisible",
]


def snapshot_relation_fact(spark: SparkSession) -> DataFrame:
    """Flattened RelationReference+Information+Statistic row per scanned
    relation: dense relation_idx, parent_relation_idx (-1 when the parent
    is not collected — postgres_relations.go:30-34), the S10 statistics
    vector, and the buffer-cache cached-bytes merge (CachedDataBytes).
    Locked relations keep their reference/info columns but a zeroed
    statistics vector (the reference emits no RelationStatistic for them,
    postgres_relations.go:69-76)."""
    withidx = _relations_with_idx(spark)
    parent_map = withidx.select(
        F.col("oid").alias("parent_oid"),
        F.col("relation_idx").alias("parent_relation_idx"),
    )
    cached = (
        spark.table("buffercache_rows")
        .groupBy("relfilenode")
        .agg(F.sum("block_bytes").cast("long").alias("cached_bytes"))
        .withColumnRenamed("relfilenode", "oid")
    )
    j = withidx.join(F.broadcast(parent_map), on="parent_oid", how="left").join(
        F.broadcast(cached), on="oid", how="left"
    )
    return j.select(
        "relation_idx",
        "oid",
        "schema_name",
        "relation_name",
        "relation_type",
        F.coalesce("parent_relation_idx", F.lit(-1)).cast("int").alias(
            "parent_relation_idx"
        ),
        F.col("parent_relation_idx").isNotNull().alias("has_parent_relation"),
        "size_bytes",
        *_REL_STAT_COLS,
        F.when(F.col("exclusively_locked"), F.lit(0))
        .otherwise(F.coalesce("cached_bytes", F.lit(0)))
        .cast("long")
        .alias("cached_data_bytes"),
        "exclusively_locked",
    ).orderBy("relation_idx")


def oracle_snapshot_relation_fact() -> str:
    stat_cols = ", ".join(f"w.{c}" for c in _REL_STAT_COLS)
    return f"""
WITH {_sql_relations_with_idx()},
parent_map AS (SELECT oid AS parent_oid, relation_idx AS parent_relation_idx
               FROM withidx)
SELECT w.relation_idx, w.oid, w.schema_name, w.relation_name, w.relation_type,
  CAST(COALESCE(p.parent_relation_idx, -1) AS INT) AS parent_relation_idx,
  p.parent_relation_idx IS NOT NULL AS has_parent_relation,
  w.size_bytes, {stat_cols},
  CAST(CASE WHEN w.exclusively_locked THEN 0
            ELSE COALESCE(c.cached_bytes, 0) END AS BIGINT) AS cached_data_bytes,
  w.exclusively_locked
FROM withidx w
LEFT JOIN parent_map p ON p.parent_oid = w.parent_oid
LEFT JOIN cached c ON c.relfilenode = w.oid
ORDER BY w.relation_idx
"""


def snapshot_index_fact(spark: SparkSession) -> DataFrame:
    """Flattened IndexReference+Information+Statistic row per scanned index
    (S11, locked placeholders included): dense index_idx, the owning
    relation's relation_idx from the SAME dim as the relation fact (-1 when
    the owner is not collected), and the per-index cached-bytes merge
    (IndexStatistic.CachedBytes, postgres_relations.go:283-299). index_oid
    is unique across the S11 output (live rows anti-joined against the
    locked set), so it keys the dense rank."""
    scan = rs.index_scan(spark)
    dim = dense_index(scan, ["index_oid"], "index_idx")
    rel_map = _relations_with_idx(spark).select(
        F.col("oid").alias("indrelid"), F.col("relation_idx")
    )
    cached = (
        spark.table("buffercache_rows")
        .groupBy("relfilenode")
        .agg(F.sum("block_bytes").cast("long").alias("cached_bytes"))
        .withColumnRenamed("relfilenode", "index_oid")
    )
    return (
        scan.join(F.broadcast(dim), on="index_oid")
        .join(F.broadcast(rel_map), on="indrelid", how="left")
        .join(F.broadcast(cached), on="index_oid", how="left")
        .select(
            "index_idx",
            F.coalesce("relation_idx", F.lit(-1)).cast("int").alias("relation_idx"),
            "index_oid",
            "indrelid",
            "index_name",
            F.col("index_size_bytes").alias("size_bytes"),
            "idx_scan",
            "idx_tup_fetch",
            "idx_blks_read",
            "idx_blks_hit",
            F.when(F.col("exclusively_locked"), F.lit(0))
            .otherwise(F.coalesce("cached_bytes", F.lit(0)))
            .cast("long")
            .alias("cached_bytes"),
            "exclusively_locked",
        )
        .orderBy("index_idx")
    )


def oracle_snapshot_index_fact() -> str:
    return f"""
WITH {_sql_relations_with_idx()},
iscan AS ({_strip_order(rs.oracle_index_scan())}),
idim AS (
  SELECT index_oid,
    CAST(row_number() OVER (ORDER BY index_oid) - 1 AS INT) AS index_idx
  FROM (SELECT DISTINCT index_oid FROM iscan)
)
SELECT d.index_idx,
  CAST(COALESCE(w.relation_idx, -1) AS INT) AS relation_idx,
  s.index_oid, s.indrelid, s.index_name,
  s.index_size_bytes AS size_bytes,
  s.idx_scan, s.idx_tup_fetch, s.idx_blks_read, s.idx_blks_hit,
  CAST(CASE WHEN s.exclusively_locked THEN 0
            ELSE COALESCE(c.cached_bytes, 0) END AS BIGINT) AS cached_bytes,
  s.exclusively_locked
FROM iscan s
JOIN idim d USING (index_oid)
LEFT JOIN withidx w ON w.oid = s.indrelid
LEFT JOIN cached c ON c.relfilenode = s.index_oid
ORDER BY d.index_idx
"""


# ---------------------------------------------------------------------------
# System fact: transformSystem's CPU/network/disk reference+statistic pairs
# flattened into one row per hardware component with a section tag. The
# reference assigns disk/network idx by sorted name (system.go:230-233,
# :249-252) — mirrored; its CPU idx comes from Go map iteration order
# (nondeterministic), replaced by numeric core order.
# ---------------------------------------------------------------------------

_SYS_COLS = [
    "user_pct",
    "system_pct",
    "idle_pct",
    "iowait_pct",
    "receive_bytes_per_sec",
    "transmit_bytes_per_sec",
    "read_ops_per_sec",
    "write_ops_per_sec",
    "read_bytes_per_sec",
    "write_bytes_per_sec",
    "avg_io_latency_ms",
    "utilization_pct",
]


def _null_fill(df: DataFrame, present: list[str]) -> DataFrame:
    cols = []
    for c in _SYS_COLS:
        if c in present:
            cols.append(F.col(c))
        elif c in ("receive_bytes_per_sec", "transmit_bytes_per_sec"):
            cols.append(F.lit(None).cast("long").alias(c))
        else:
            cols.append(F.lit(None).cast("double").alias(c))
    return df.select("section", "ref_idx", "ref_name", *cols)


def snapshot_system_fact(spark: SparkSession) -> DataFrame:
    """One row per CPU core / network interface / disk device, each with a
    section-local dense ref_idx and the diffed statistics vector from the
    green A5/A6b/A6 kernels; columns outside a component's section are
    NULL (the protobuf keeps them in separate arrays)."""
    cpu = sysops.cpu_percentages(spark)
    cpu_dim = dense_index(cpu, ["cpu_id"], "ref_idx")
    cpu_rows = cpu.join(F.broadcast(cpu_dim), on="cpu_id").select(
        F.lit("cpu").alias("section"),
        "ref_idx",
        F.col("cpu_id").cast("string").alias("ref_name"),
        "user_pct",
        "system_pct",
        "idle_pct",
        "iowait_pct",
    )
    net = sysops.net_rates(spark)
    net_dim = dense_index(net, ["interface"], "ref_idx")
    net_rows = net.join(F.broadcast(net_dim), on="interface").select(
        F.lit("network").alias("section"),
        "ref_idx",
        F.col("interface").alias("ref_name"),
        "receive_bytes_per_sec",
        "transmit_bytes_per_sec",
    )
    disk = sysops.disk_rates(spark)
    disk_dim = dense_index(disk, ["device"], "ref_idx")
    disk_rows = disk.join(F.broadcast(disk_dim), on="device").select(
        F.lit("disk").alias("section"),
        "ref_idx",
        F.col("device").alias("ref_name"),
        "read_ops_per_sec",
        "write_ops_per_sec",
        "read_bytes_per_sec",
        "write_bytes_per_sec",
        "avg_io_latency_ms",
        "utilization_pct",
    )
    return (
        _null_fill(cpu_rows, ["user_pct", "system_pct", "idle_pct", "iowait_pct"])
        .unionByName(
            _null_fill(net_rows, ["receive_bytes_per_sec", "transmit_bytes_per_sec"])
        )
        .unionByName(
            _null_fill(
                disk_rows,
                [
                    "read_ops_per_sec",
                    "write_ops_per_sec",
                    "read_bytes_per_sec",
                    "write_bytes_per_sec",
                    "avg_io_latency_ms",
                    "utilization_pct",
                ],
            )
        )
        .orderBy("section", "ref_idx")
    )


def oracle_snapshot_system_fact() -> str:
    def sel(present: dict[str, str]) -> str:
        outs = []
        for c in _SYS_COLS:
            if c in present:
                outs.append(f"{present[c]} AS {c}")
            elif c in ("receive_bytes_per_sec", "transmit_bytes_per_sec"):
                outs.append(f"CAST(NULL AS BIGINT) AS {c}")
            else:
                outs.append(f"CAST(NULL AS DOUBLE) AS {c}")
        return ", ".join(outs)

    cpu = _strip_order(sysops.oracle_cpu_percentages())
    net = _strip_order(sysops.oracle_net_rates())
    disk = _strip_order(sysops.oracle_disk_rates())
    ident = {c: c for c in _SYS_COLS}
    return f"""
WITH cpu AS ({cpu}), net AS ({net}), disk AS ({disk})
SELECT * FROM (
  SELECT 'cpu' AS section,
    CAST(row_number() OVER (ORDER BY cpu_id) - 1 AS INT) AS ref_idx,
    CAST(cpu_id AS VARCHAR) AS ref_name,
    {sel({k: ident[k] for k in ('user_pct', 'system_pct', 'idle_pct', 'iowait_pct')})}
  FROM cpu
  UNION ALL
  SELECT 'network' AS section,
    CAST(row_number() OVER (ORDER BY interface) - 1 AS INT) AS ref_idx,
    interface AS ref_name,
    {sel({k: ident[k] for k in ('receive_bytes_per_sec', 'transmit_bytes_per_sec')})}
  FROM net
  UNION ALL
  SELECT 'disk' AS section,
    CAST(row_number() OVER (ORDER BY device) - 1 AS INT) AS ref_idx,
    device AS ref_name,
    {sel({k: ident[k] for k in ('read_ops_per_sec', 'write_ops_per_sec',
                                'read_bytes_per_sec', 'write_bytes_per_sec',
                                'avg_io_latency_ms', 'utilization_pct')})}
  FROM disk
) u
ORDER BY section, ref_idx
"""


# ---------------------------------------------------------------------------
# Full system fact: the complete transformSystem surface — the CPU/network/
# disk sections above PLUS the sections the reference also emits
# (output/transform/system.go:160-356): the single-row memory statistic
# (:172-193), the scheduler load averages (:166-170), disk partitions with
# their disk-idx link (:318-345), and the system-information row carrying
# host identity, core counts, xlog usage, and the data-directory/xlog
# partition idx links (:146-205, :346-353). Same flattening convention:
# parallel protobuf arrays become one row per member with a section tag and
# a section-local dense idx; columns outside a section stay NULL.
# ---------------------------------------------------------------------------

_SYS_FULL_TYPES: dict[str, str] = {
    **{c: "double" for c in _SYS_COLS},
    "receive_bytes_per_sec": "long",
    "transmit_bytes_per_sec": "long",
    # memory statistic + disk-partition usage (shared byte gauges)
    "total_bytes": "long",
    "free_bytes": "long",
    "cached_bytes": "long",
    "buffers_bytes": "long",
    "swap_used_bytes": "long",
    "used_bytes": "long",
    "available_bytes": "long",
    # scheduler statistic
    "loadavg_1min": "double",
    "loadavg_5min": "double",
    "loadavg_15min": "double",
    # disk partition information
    "disk_idx": "int",
    "filesystem_type": "string",
    "filesystem_opts": "string",
    "partition_name": "string",
    # system information
    "xlog_used_bytes": "long",
    "logical_core_count": "int",
    "physical_core_count": "int",
    "socket_count": "int",
    "data_directory_partition_idx": "int",
    "xlog_partition_idx": "int",
}


def _null_fill_full(df: DataFrame, present: list[str]) -> DataFrame:
    cols = [
        F.col(c) if c in present else F.lit(None).cast(t).alias(c)
        for c, t in _SYS_FULL_TYPES.items()
    ]
    return df.select("section", "ref_idx", "ref_name", *cols)


def snapshot_system_fact_full(spark: SparkSession) -> DataFrame:
    """All seven transformSystem sections as one fact. Every input here is
    host-bounded (cores/disks/mounts/1-row gauges), so all dim joins
    broadcast and the only shuffles are the upstream diff kernels."""
    base = snapshot_system_fact(spark)

    mem = sysops.memory_scan(spark).select(
        F.lit("memory").alias("section"),
        F.lit(0).cast("int").alias("ref_idx"),
        F.lit("memory").alias("ref_name"),
        "total_bytes",
        "free_bytes",
        "cached_bytes",
        "buffers_bytes",
        "swap_used_bytes",
        "used_bytes",
        "available_bytes",
    )

    sched = spark.table("load_state").select(
        F.lit("scheduler").alias("section"),
        F.lit(0).cast("int").alias("ref_idx"),
        F.lit("scheduler").alias("ref_name"),
        "loadavg_1min",
        "loadavg_5min",
        "loadavg_15min",
    )

    dp = spark.table("disk_partitions")
    dp_dim = dense_index(dp, ["mountpoint"], "ref_idx")
    disk_dim = dense_index(
        sysops.disk_rates(spark).select("device"), ["device"], "disk_idx"
    )
    dp_rows = (
        dp.join(F.broadcast(dp_dim), on="mountpoint")
        .join(F.broadcast(disk_dim), on="device", how="left")
        .select(
            F.lit("disk_partition").alias("section"),
            "ref_idx",
            F.col("mountpoint").alias("ref_name"),
            "disk_idx",
            "filesystem_type",
            "filesystem_opts",
            "partition_name",
            "used_bytes",
            "total_bytes",
        )
    )

    si = spark.table("system_info")
    dd_idx = dp_dim.select(
        F.col("mountpoint").alias("data_directory_partition"),
        F.col("ref_idx").alias("data_directory_partition_idx"),
    )
    xl_idx = dp_dim.select(
        F.col("mountpoint").alias("xlog_partition"),
        F.col("ref_idx").alias("xlog_partition_idx"),
    )
    si_rows = (
        si.join(F.broadcast(dd_idx), on="data_directory_partition", how="left")
        .join(F.broadcast(xl_idx), on="xlog_partition", how="left")
        .select(
            F.lit("system_info").alias("section"),
            F.lit(0).cast("int").alias("ref_idx"),
            F.col("system_id").alias("ref_name"),
            "xlog_used_bytes",
            "logical_core_count",
            "physical_core_count",
            "socket_count",
            "data_directory_partition_idx",
            "xlog_partition_idx",
        )
    )

    return (
        _null_fill_full(base, _SYS_COLS)
        .unionByName(
            _null_fill_full(
                mem,
                [
                    "total_bytes",
                    "free_bytes",
                    "cached_bytes",
                    "buffers_bytes",
                    "swap_used_bytes",
                    "used_bytes",
                    "available_bytes",
                ],
            )
        )
        .unionByName(
            _null_fill_full(sched, ["loadavg_1min", "loadavg_5min", "loadavg_15min"])
        )
        .unionByName(
            _null_fill_full(
                dp_rows,
                [
                    "disk_idx",
                    "filesystem_type",
                    "filesystem_opts",
                    "partition_name",
                    "used_bytes",
                    "total_bytes",
                ],
            )
        )
        .unionByName(
            _null_fill_full(
                si_rows,
                [
                    "xlog_used_bytes",
                    "logical_core_count",
                    "physical_core_count",
                    "socket_count",
                    "data_directory_partition_idx",
                    "xlog_partition_idx",
                ],
            )
        )
        .orderBy("section", "ref_idx")
    )


def oracle_snapshot_system_fact_full() -> str:
    duck_t = {"long": "BIGINT", "int": "INT", "double": "DOUBLE", "string": "VARCHAR"}

    def sel(present: dict[str, str]) -> str:
        outs = []
        for c, t in _SYS_FULL_TYPES.items():
            if c in present:
                outs.append(f"{present[c]} AS {c}")
            else:
                outs.append(f"CAST(NULL AS {duck_t[t]}) AS {c}")
        return ", ".join(outs)

    ident = lambda names: {k: k for k in names}  # noqa: E731
    base = _strip_order(oracle_snapshot_system_fact())
    mem = _strip_order(sysops.oracle_memory_scan())
    return f"""
WITH base AS ({base}),
mem AS ({mem}),
dpdim AS (
  SELECT mountpoint, CAST(row_number() OVER (ORDER BY mountpoint) - 1 AS INT)
    AS p_idx
  FROM (SELECT DISTINCT mountpoint FROM disk_partitions)
),
ddim AS (
  SELECT device, CAST(row_number() OVER (ORDER BY device) - 1 AS INT) AS disk_idx
  FROM (SELECT DISTINCT device FROM ({_strip_order(sysops.oracle_disk_rates())}) dr)
)
SELECT * FROM (
  SELECT section, ref_idx, ref_name,
    {sel(ident(_SYS_COLS))}
  FROM base
  UNION ALL
  SELECT 'memory' AS section, CAST(0 AS INT) AS ref_idx, 'memory' AS ref_name,
    {sel(ident(['total_bytes', 'free_bytes', 'cached_bytes', 'buffers_bytes',
                'swap_used_bytes', 'used_bytes', 'available_bytes']))}
  FROM mem
  UNION ALL
  SELECT 'scheduler' AS section, CAST(0 AS INT) AS ref_idx,
    'scheduler' AS ref_name,
    {sel(ident(['loadavg_1min', 'loadavg_5min', 'loadavg_15min']))}
  FROM load_state
  UNION ALL
  SELECT 'disk_partition' AS section, d.p_idx AS ref_idx,
    p.mountpoint AS ref_name,
    {sel(ident(['disk_idx', 'filesystem_type', 'filesystem_opts',
                'partition_name', 'used_bytes', 'total_bytes']))}
  FROM disk_partitions p
  JOIN dpdim d USING (mountpoint)
  LEFT JOIN ddim USING (device)
  UNION ALL
  SELECT 'system_info' AS section, CAST(0 AS INT) AS ref_idx,
    s.system_id AS ref_name,
    {sel({**ident(['xlog_used_bytes', 'logical_core_count',
                   'physical_core_count', 'socket_count']),
          'data_directory_partition_idx': 'dd.p_idx',
          'xlog_partition_idx': 'xl.p_idx'})}
  FROM system_info s
  LEFT JOIN dpdim dd ON dd.mountpoint = s.data_directory_partition
  LEFT JOIN dpdim xl ON xl.mountpoint = s.xlog_partition
) u
ORDER BY section, ref_idx
"""


# ---------------------------------------------------------------------------
# Backend fact: transformBackendWithoutRefs's field vector per backend with
# the activity dims' dense database/role idx and the S5 synthetic identity
# (input/postgres/backends.go:19-25).
# ---------------------------------------------------------------------------


def snapshot_backend_fact(spark: SparkSession) -> DataFrame:
    b = spark.table("backends")
    db_dim = dense_index(b, ["database_oid"], "database_idx")
    role_dim = dense_index(b, ["role_oid"], "role_idx")
    identity = F.concat(
        F.unix_timestamp("backend_start").cast("string"),
        F.lpad(F.col("pid").cast("string"), 7, "0"),
    ).cast("long")
    return (
        b.join(F.broadcast(db_dim), on="database_oid")
        .join(F.broadcast(role_dim), on="role_oid")
        .select(
            "backend_id",
            identity.alias("identity"),
            "pid",
            "database_idx",
            "database_oid",
            "role_idx",
            "role_oid",
            "state",
            "backend_type",
            "waiting",
            "application_name",
        )
        .orderBy("backend_id")
    )


def oracle_snapshot_backend_fact() -> str:
    return """
WITH db_dim AS (
  SELECT database_oid,
    CAST(row_number() OVER (ORDER BY database_oid) - 1 AS INT) AS database_idx
  FROM (SELECT DISTINCT database_oid FROM backends)
),
role_dim AS (
  SELECT role_oid,
    CAST(row_number() OVER (ORDER BY role_oid) - 1 AS INT) AS role_idx
  FROM (SELECT DISTINCT role_oid FROM backends)
)
SELECT b.backend_id,
  CAST(CAST(CAST(floor(epoch(b.backend_start)) AS BIGINT) AS VARCHAR)
       || lpad(CAST(b.pid AS VARCHAR), 7, '0') AS BIGINT) AS identity,
  b.pid, d.database_idx, b.database_oid, r.role_idx, b.role_oid,
  b.state, b.backend_type, b.waiting, b.application_name
FROM backends b
JOIN db_dim d USING (database_oid)
JOIN role_dim r USING (role_oid)
ORDER BY b.backend_id
"""


# ---------------------------------------------------------------------------
# Replication fact: StandbyReference+Information+Statistic flattened per
# standby over the green S26 lag scan, with the reference's -1 defaults for
# invalid byte lags (postgres_replication.go:77-86) and a dense role_idx.
# standby_idx ranks the unique (client_addr, pid, sent_lsn) triple — the
# reference's insertion order is the scan's row order, which a distributed
# engine replaces with a total sorted rank.
# ---------------------------------------------------------------------------


def snapshot_replication_fact(spark: SparkSession) -> DataFrame:
    lag = standby_lag(spark)
    dim = dense_index(lag, ["client_addr", "pid", "sent_lsn"], "standby_idx")
    role_dim = dense_index(lag, ["role_oid"], "role_idx")
    return (
        lag.join(F.broadcast(dim), on=["client_addr", "pid", "sent_lsn"])
        .join(F.broadcast(role_dim), on="role_oid")
        .select(
            "standby_idx",
            "client_addr",
            "role_idx",
            "role_oid",
            "pid",
            "application_name",
            "sync_priority",
            "sync_state",
            "state",
            "sent_lsn",
            "write_lsn",
            "flush_lsn",
            "replay_lsn",
            F.coalesce("remote_byte_lag", F.lit(-1)).cast("long").alias(
                "remote_byte_lag"
            ),
            F.coalesce("local_byte_lag", F.lit(-1)).cast("long").alias(
                "local_byte_lag"
            ),
        )
        .orderBy("standby_idx")
    )


def oracle_snapshot_replication_fact() -> str:
    return f"""
WITH lag AS ({_strip_order(oracle_standby_lag())}),
sdim AS (
  SELECT client_addr, pid, sent_lsn,
    CAST(row_number() OVER (ORDER BY client_addr, pid, sent_lsn) - 1 AS INT)
      AS standby_idx
  FROM (SELECT DISTINCT client_addr, pid, sent_lsn FROM lag)
),
rdim AS (
  SELECT role_oid,
    CAST(row_number() OVER (ORDER BY role_oid) - 1 AS INT) AS role_idx
  FROM (SELECT DISTINCT role_oid FROM lag)
)
SELECT s.standby_idx, l.client_addr, r.role_idx, l.role_oid, l.pid,
  l.application_name, l.sync_priority, l.sync_state, l.state,
  l.sent_lsn, l.write_lsn, l.flush_lsn, l.replay_lsn,
  CAST(COALESCE(l.remote_byte_lag, -1) AS BIGINT) AS remote_byte_lag,
  CAST(COALESCE(l.local_byte_lag, -1) AS BIGINT) AS local_byte_lag
FROM lag l
JOIN sdim s USING (client_addr, pid, sent_lsn)
JOIN rdim r USING (role_oid)
ORDER BY s.standby_idx
"""


# ---------------------------------------------------------------------------
# Function fact: FunctionReference+Information per pg_proc row with the A8
# diffed statistics left-joined (the reference emits a FunctionStatistic
# only when stats exist, postgres_functions.go:62-73 — flattened here as a
# has_stats flag with NULL counters).
# ---------------------------------------------------------------------------

_KIND_CASE = {
    "f": "function",
    "p": "procedure",
    "a": "aggregate",
    "w": "window",
}


def snapshot_function_fact(spark: SparkSession) -> DataFrame:
    meta = spark.table("func_meta")
    fdim = dense_index(meta, ["schema_name", "function_name"], "function_idx")
    db_dim = dense_index(meta, ["database_oid"], "database_idx")
    kind = F.col("kind")
    kind_name = F.lit("unknown")
    for k, v in reversed(_KIND_CASE.items()):
        kind_name = F.when(kind == k, F.lit(v)).otherwise(kind_name)
    stats = function_diff(spark).select(
        "database_oid",
        "function_oid",
        F.col("calls").alias("s_calls"),
        F.col("total_time").alias("s_total_time"),
        F.col("self_time").alias("s_self_time"),
    )
    return (
        meta.join(F.broadcast(fdim), on=["schema_name", "function_name"])
        .join(F.broadcast(db_dim), on="database_oid")
        .join(stats, on=["database_oid", "function_oid"], how="left")
        .select(
            "function_idx",
            "database_idx",
            "database_oid",
            "function_oid",
            "schema_name",
            "function_name",
            "language",
            kind_name.alias("kind"),
            "security_definer",
            "leakproof",
            "strict",
            "returns_set",
            "volatile",
            F.col("s_calls").isNotNull().alias("has_stats"),
            F.col("s_calls").alias("calls"),
            F.col("s_total_time").alias("total_time"),
            F.col("s_self_time").alias("self_time"),
        )
        .orderBy("function_idx")
    )


def oracle_snapshot_function_fact() -> str:
    return f"""
WITH fdim AS (
  SELECT schema_name, function_name,
    CAST(row_number() OVER (ORDER BY schema_name, function_name) - 1 AS INT)
      AS function_idx
  FROM (SELECT DISTINCT schema_name, function_name FROM func_meta)
),
db_dim AS (
  SELECT database_oid,
    CAST(row_number() OVER (ORDER BY database_oid) - 1 AS INT) AS database_idx
  FROM (SELECT DISTINCT database_oid FROM func_meta)
),
stats AS ({oracle_function_diff()})
SELECT f.function_idx, d.database_idx, m.database_oid, m.function_oid,
  m.schema_name, m.function_name, m.language,
  CASE m.kind WHEN 'f' THEN 'function' WHEN 'p' THEN 'procedure'
              WHEN 'a' THEN 'aggregate' WHEN 'w' THEN 'window'
              ELSE 'unknown' END AS kind,
  m.security_definer, m.leakproof, m.strict, m.returns_set, m.volatile,
  s.calls IS NOT NULL AS has_stats,
  s.calls, s.total_time, s.self_time
FROM func_meta m
JOIN fdim f USING (schema_name, function_name)
JOIN db_dim d USING (database_oid)
LEFT JOIN stats s USING (database_oid, function_oid)
ORDER BY f.function_idx
"""


# ---------------------------------------------------------------------------
# Database fact: DatabaseReference+Information+Statistic per database
# (output/transform/postgres.go:68-120) with the buffer-cache untracked
# remainder merged into the statistic row
# (output/transform/postgres_buffer_cache.go:8-22 — after the relation
# transform consumes tracked filenodes, what remains per database is the
# untracked byte sum, which is exactly A11's remainder split).
# ---------------------------------------------------------------------------


def snapshot_database_fact(spark: SparkSession) -> DataFrame:
    from collector_spark.operators.buffer_cache import buffercache_totals
    from collector_spark.operators.databases import database_diff

    dims = spark.table("databases")
    db_dim = dense_index(dims, ["database_name"], "database_idx")
    stats = database_diff(spark).select(
        "database_oid",
        F.col("xact_commit").alias("s_xact_commit"),
        F.col("xact_rollback").alias("s_xact_rollback"),
        F.col("temp_files").alias("s_temp_files"),
        F.col("temp_bytes").alias("s_temp_bytes"),
        F.col("frozenxid_age").alias("s_frozenxid_age"),
        F.col("minmxid_age").alias("s_minmxid_age"),
    )
    untracked = buffercache_totals(spark).select(
        "database_oid", "untracked_bytes"
    )
    return (
        dims.join(F.broadcast(db_dim), on="database_name")
        .join(F.broadcast(stats), on="database_oid", how="left")
        .join(F.broadcast(untracked), on="database_oid", how="left")
        .select(
            "database_idx",
            "database_oid",
            "database_name",
            "datfrozenxid",
            # the reference emits a DatabaseStatistic only when a diff
            # exists (postgres.go:104-117) — flattened as a flag
            F.col("s_xact_commit").isNotNull().alias("has_stats"),
            F.col("s_xact_commit").alias("xact_commit"),
            F.col("s_xact_rollback").alias("xact_rollback"),
            F.col("s_temp_files").alias("temp_files"),
            F.col("s_temp_bytes").alias("temp_bytes"),
            F.col("s_frozenxid_age").alias("frozenxid_age"),
            F.col("s_minmxid_age").alias("minmxid_age"),
            F.coalesce("untracked_bytes", F.lit(0)).cast("long").alias(
                "untracked_cache_bytes"
            ),
        )
        .orderBy("database_idx")
    )


def oracle_snapshot_database_fact() -> str:
    from collector_spark.operators.buffer_cache import oracle_buffercache_totals
    from collector_spark.operators.databases import oracle_database_diff

    diff = _strip_order(oracle_database_diff())
    bc = _strip_order(oracle_buffercache_totals())
    return f"""
WITH db_dim AS (
  SELECT database_name,
    CAST(row_number() OVER (ORDER BY database_name) - 1 AS INT) AS database_idx
  FROM (SELECT DISTINCT database_name FROM databases)
),
stats AS ({diff}),
bc AS ({bc})
SELECT x.database_idx, d.database_oid, d.database_name, d.datfrozenxid,
  s.xact_commit IS NOT NULL AS has_stats,
  s.xact_commit, s.xact_rollback, s.temp_files, s.temp_bytes,
  s.frozenxid_age, s.minmxid_age,
  CAST(COALESCE(b.untracked_bytes, 0) AS BIGINT) AS untracked_cache_bytes
FROM databases d
JOIN db_dim x USING (database_name)
LEFT JOIN stats s USING (database_oid)
LEFT JOIN bc b USING (database_oid)
ORDER BY x.database_idx
"""


# ---------------------------------------------------------------------------
# Custom type fact: the pg_type scan filters (input/postgres/types.go:12-38
# — drop base types, implicit array types, and extension-owned types) plus
# transformPostgresTypes' kind mapping and dense idx
# (output/transform/postgres_types.go:8-56). The reference aliases each
# type's array oid to the same idx for column DataTypeCustomIdx resolution;
# array_oid rides the fact row so the alias map is a projection. The
# composite typrelid/relkind='c' sub-check has no catalog analog in the
# fixture (noted divergence); detail payloads stay in the scan's own JSON
# text form (types.go:22-31 builds them as json_agg text).
# ---------------------------------------------------------------------------

_TYPE_KINDS = {
    "e": "enum",
    "d": "domain",
    "c": "composite",
    "b": "base",
    "p": "pseudo",
    "r": "range",
    "m": "multirange",
}


def snapshot_custom_type_fact(spark: SparkSession) -> DataFrame:
    t = spark.table("type_rows")
    ext = (
        spark.table("depend_rows")
        .filter(F.col("deptype") == "e")
        .select(F.col("objid").alias("type_oid"))
        .distinct()
    )
    # implicit array types: a row whose oid IS another row's array form
    arrays = t.select(F.col("array_oid").alias("type_oid")).filter(
        F.col("type_oid") != 0
    )
    base = (
        t.filter(F.col("typtype") != "b")
        .join(F.broadcast(ext), on="type_oid", how="left_anti")
        .join(F.broadcast(arrays), on="type_oid", how="left_anti")
    )
    dim = dense_index(base, ["schema_name", "type_name"], "type_idx")
    db_dim = dense_index(base, ["database_oid"], "database_idx")
    kind = F.lit("unknown")
    for k, v in reversed(_TYPE_KINDS.items()):
        kind = F.when(F.col("typtype") == k, F.lit(v)).otherwise(kind)
    return (
        base.join(F.broadcast(dim), on=["schema_name", "type_name"])
        .join(F.broadcast(db_dim), on="database_oid")
        .select(
            "type_idx",
            "database_idx",
            "database_oid",
            "type_oid",
            "array_oid",
            "schema_name",
            "type_name",
            kind.alias("kind"),
            "domain_type",
            "domain_not_null",
            "domain_default",
            "type_json",
        )
        .orderBy("type_idx")
    )


def oracle_snapshot_custom_type_fact() -> str:
    kind_case = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in _TYPE_KINDS.items()
    )
    return f"""
WITH base AS (
  SELECT t.* FROM type_rows t
  WHERE t.typtype <> 'b'
    AND t.type_oid NOT IN (SELECT objid FROM depend_rows WHERE deptype = 'e')
    AND t.type_oid NOT IN (SELECT array_oid FROM type_rows WHERE array_oid <> 0)
),
dim AS (
  SELECT schema_name, type_name,
    CAST(row_number() OVER (ORDER BY schema_name, type_name) - 1 AS INT) AS type_idx
  FROM (SELECT DISTINCT schema_name, type_name FROM base)
),
db_dim AS (
  SELECT database_oid,
    CAST(row_number() OVER (ORDER BY database_oid) - 1 AS INT) AS database_idx
  FROM (SELECT DISTINCT database_oid FROM base)
)
SELECT x.type_idx, d.database_idx, b.database_oid, b.type_oid, b.array_oid,
  b.schema_name, b.type_name,
  CASE b.typtype {kind_case} ELSE 'unknown' END AS kind,
  b.domain_type, b.domain_not_null, b.domain_default, b.type_json
FROM base b
JOIN dim x USING (schema_name, type_name)
JOIN db_dim d USING (database_oid)
ORDER BY x.type_idx
"""


# ---------------------------------------------------------------------------
# Relation maintenance events: addRelationEvents
# (output/transform/postgres_relations.go:300-324) — each (auto)vacuum /
# (auto)analyze count explodes into that many event rows stamped with the
# LAST occurrence time; only the first copy is exact, the rest are
# approximate (ApproximateOccurredAt = i != 0). Joined to the shared
# relation dim so event idx space matches the relation fact.
# ---------------------------------------------------------------------------

_EVENT_KINDS = [
    ("manual_analyze", "analyze_count", "last_analyze"),
    ("auto_analyze", "autoanalyze_count", "last_autoanalyze"),
    ("manual_vacuum", "vacuum_count", "last_vacuum"),
    ("auto_vacuum", "autovacuum_count", "last_autovacuum"),
]


def snapshot_relation_events(spark: SparkSession) -> DataFrame:
    counts = spark.table("relation_event_counts")
    rel = _relations_with_idx(spark).select(
        F.col("oid").alias("relation_oid"), "relation_idx"
    )
    j = counts.join(F.broadcast(rel), on="relation_oid")
    branches = []
    for kind, count_col, ts_col in _EVENT_KINDS:
        seq = F.when(
            F.col(count_col) > 0, F.sequence(F.lit(1), F.col(count_col))
        ).otherwise(F.array().cast("array<int>"))
        branches.append(
            j.select(
                "relation_idx",
                "relation_oid",
                F.lit(kind).alias("event_type"),
                F.col(ts_col).alias("occurred_at"),
                F.explode(seq).alias("event_seq"),
            ).select(
                "relation_idx",
                "relation_oid",
                "event_type",
                "occurred_at",
                F.col("event_seq").cast("long").alias("event_seq"),
                (F.col("event_seq") > 1).alias("approximate"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionAll(b)
    return out.orderBy("relation_idx", "event_type", "event_seq")


def oracle_snapshot_relation_events() -> str:
    selects = []
    for kind, count_col, ts_col in _EVENT_KINDS:
        selects.append(f"""
SELECT r.relation_idx, c.relation_oid, '{kind}' AS event_type,
  c.{ts_col} AS occurred_at, CAST(gs.i AS BIGINT) AS event_seq,
  gs.i > 1 AS approximate
FROM relation_event_counts c
JOIN withidx r ON r.oid = c.relation_oid,
LATERAL (SELECT unnest(generate_series(1, c.{count_col})) AS i) gs
WHERE c.{count_col} > 0""")
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH {_sql_relations_with_idx()}
{union}
ORDER BY relation_idx, event_type, event_seq
"""


# ---------------------------------------------------------------------------
# Column -> custom-type link: DataTypeCustomIdx resolution
# (postgres_relations.go:115-118) — a column's pg_attribute type oid
# resolves to the custom-type dim either directly or through the type's
# implicit array oid (transformPostgresTypes aliases both to one idx,
# postgres_types.go:49-53). Spelled as two broadcast equi-joins +
# COALESCE rather than an OR-join (an OR predicate would fall back to
# broadcast-nested-loop).
# ---------------------------------------------------------------------------


def snapshot_column_type_link(spark: SparkSession) -> DataFrame:
    cols = spark.table("column_rows")
    types = snapshot_custom_type_fact(spark)
    by_oid = types.select(
        F.col("type_oid").alias("type_oid"), F.col("type_idx").alias("idx_direct")
    )
    by_arr = types.filter(F.col("array_oid") != 0).select(
        F.col("array_oid").alias("type_oid"), F.col("type_idx").alias("idx_array")
    )
    j = cols.join(F.broadcast(by_oid), on="type_oid", how="left").join(
        F.broadcast(by_arr), on="type_oid", how="left"
    )
    idx = F.coalesce("idx_direct", "idx_array")
    return j.select(
        "relation_oid",
        "column_name",
        "position",
        "data_type",
        "type_oid",
        F.coalesce(idx, F.lit(-1)).cast("int").alias("data_type_custom_idx"),
        idx.isNotNull().alias("has_custom_type"),
        (idx.isNotNull() & F.col("idx_direct").isNull()).alias(
            "resolved_via_array_oid"
        ),
    ).orderBy("relation_oid", "position", "column_name")


def oracle_snapshot_column_type_link() -> str:
    types = oracle_snapshot_custom_type_fact().rsplit("ORDER BY", 1)[0]
    return f"""
WITH types AS ({types}),
by_oid AS (SELECT type_oid, type_idx AS idx_direct FROM types),
by_arr AS (SELECT array_oid AS type_oid, type_idx AS idx_array
           FROM types WHERE array_oid <> 0)
SELECT c.relation_oid, c.column_name, c.position, c.data_type, c.type_oid,
  CAST(COALESCE(COALESCE(o.idx_direct, a.idx_array), -1) AS INT) AS data_type_custom_idx,
  COALESCE(o.idx_direct, a.idx_array) IS NOT NULL AS has_custom_type,
  COALESCE(o.idx_direct, a.idx_array) IS NOT NULL AND o.idx_direct IS NULL
    AS resolved_via_array_oid
FROM column_rows c
LEFT JOIN by_oid o USING (type_oid)
LEFT JOIN by_arr a USING (type_oid)
ORDER BY c.relation_oid, c.position, c.column_name
"""


# ---------------------------------------------------------------------------
# Full-snapshot emit: the output/full.go analog — every dim-indexed fact
# written as one integrity-checked, partitioned parquet snapshot (the
# protobuf-over-HTTPS sink is replaced by a cluster-native format; the
# same star schema, one directory per fact family). Facts partition by
# their natural tenant key where one exists.
# ---------------------------------------------------------------------------


def _assert_dense_idx(df: DataFrame, col: str) -> None:
    """output/full.go:26-33 verify: idx present, non-negative, gap-free."""
    row = df.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col(col).isNull() | (F.col(col) < 0), 1).otherwise(0)).alias(
            "bad"
        ),
        (F.max(col) + 1 - F.count_distinct(col)).alias("gap"),
    ).collect()[0]
    if row["n"] == 0:
        # an empty fact is a normal snapshot state (e.g. zero standbys, no
        # custom types): the reference uploads empty arrays, not an error
        return
    if row["bad"]:
        raise ValueError(f"full snapshot integrity: {row['bad']} bad {col}")
    if row["gap"] != 0:
        raise ValueError(f"full snapshot integrity: non-dense {col} space")


def _assert_idx_link(df: DataFrame, col: str, sentinel: bool = False) -> None:
    """Foreign-idx integrity: every value resolves (non-null, >= 0), or
    >= -1 where the reference uses a not-found sentinel. Link columns repeat
    and need not be gap-free — that's the owning dim's invariant."""
    floor = -1 if sentinel else 0
    bad = df.filter(F.col(col).isNull() | (F.col(col) < floor)).limit(1).count()
    if bad:
        raise ValueError(f"full snapshot integrity: unresolved {col} link")


def write_full_snapshot(spark: SparkSession, path: str) -> dict[str, int]:
    """Assemble and write every snapshot fact; returns per-fact row counts
    (the smoke surface a scheduler would log). Each fact's dense idx space
    is verified before any write so a broken dimension aborts the whole
    snapshot, like the reference's pre-upload VerifyIntegrity."""
    from collector_spark.operators.snapshot import (
        assemble_statement_fact,
        snapshot_plan_fact as _plan_fact,
    )

    facts: dict[str, tuple[DataFrame, str | None, str, str]] = {
        # name -> (df, partition column or None, idx column, idx kind):
        # "dense" = the fact's own idx space must be gap-free;
        # "link" = a foreign idx into another fact's dim (>= 0, repeats ok);
        # "link-1" = link with the reference's -1 not-found sentinel
        "statement_fact": (assemble_statement_fact(spark), "database_oid", "query_idx", "dense"),
        "relation_fact": (snapshot_relation_fact(spark), None, "relation_idx", "dense"),
        "index_fact": (snapshot_index_fact(spark), None, "index_idx", "dense"),
        "system_fact": (snapshot_system_fact_full(spark), "section", "ref_idx", "dense"),
        "backend_fact": (snapshot_backend_fact(spark), "database_oid", "database_idx", "dense"),
        "replication_fact": (snapshot_replication_fact(spark), None, "standby_idx", "dense"),
        "function_fact": (snapshot_function_fact(spark), "database_oid", "function_idx", "dense"),
        "database_fact": (snapshot_database_fact(spark), None, "database_idx", "dense"),
        "custom_type_fact": (snapshot_custom_type_fact(spark), "database_oid", "type_idx", "dense"),
        "role_fact": (snapshot_role_fact(spark), None, "role_idx", "dense"),
        "extension_fact": (snapshot_extension_fact(spark), None, "database_idx", "link-1"),
        "relation_events": (snapshot_relation_events(spark), None, "relation_idx", "link"),
        "column_type_link": (snapshot_column_type_link(spark), None, "data_type_custom_idx", "link-1"),
        "plan_fact": (_plan_fact(spark), None, "plan_idx", "dense"),
        "backend_count_fact": (snapshot_backend_count_fact(spark), None, "database_idx", "link-1"),
    }
    counts: dict[str, int] = {}
    for name, (df, part, idx_col, kind) in facts.items():
        if name == "system_fact":
            # section-local idx spaces: verify per section
            for sec in (
                "cpu",
                "network",
                "disk",
                "memory",
                "scheduler",
                "disk_partition",
                "system_info",
            ):
                _assert_dense_idx(df.filter(F.col("section") == sec), idx_col)
        elif kind == "dense":
            _assert_dense_idx(df, idx_col)
        else:
            _assert_idx_link(df, idx_col, sentinel=(kind == "link-1"))
        writer = df.write.mode("overwrite")
        if part is not None:
            writer = writer.partitionBy(part)
        writer.parquet(f"{path}/{name}")
        counts[name] = spark.read.parquet(f"{path}/{name}").count()
    return counts


# ---------------------------------------------------------------------------
# Role fact: RoleReference+RoleInformation per role
# (output/transform/postgres.go:33-66) with the MemberOf OID list
# translated into the dense role-idx space — the reference resolves each
# membership oid through roleOidToIdx; unknown oids are dropped (the Go
# zero-value-on-missing lookup is a silent-0 hazard the relational inner
# join avoids).
# ---------------------------------------------------------------------------


def snapshot_role_fact(spark: SparkSession) -> DataFrame:
    roles = spark.table("role_rows")
    dim = dense_index(roles, ["rolname"], "role_idx")
    withidx = roles.join(F.broadcast(dim), on="rolname")
    oid_to_idx = withidx.select(
        F.col("role_oid").alias("member_of_oid"),
        F.col("role_idx").alias("member_idx"),
    )
    members = (
        spark.table("role_members")
        .join(F.broadcast(oid_to_idx), on="member_of_oid")
        .groupBy("role_oid")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list(F.col("member_idx").cast("string"))),
                ",",
            ).alias("member_of_idxs")
        )
    )
    return (
        withidx.join(F.broadcast(members), on="role_oid", how="left")
        .select(
            "role_idx",
            "role_oid",
            "rolname",
            "superuser",
            "can_login",
            "create_db",
            "conn_limit",
            F.coalesce("member_of_idxs", F.lit("")).alias("member_of_idxs"),
        )
        .orderBy("role_idx")
    )


def oracle_snapshot_role_fact() -> str:
    return """
WITH dim AS (
  SELECT rolname,
    CAST(row_number() OVER (ORDER BY rolname) - 1 AS INT) AS role_idx
  FROM (SELECT DISTINCT rolname FROM role_rows)
),
withidx AS (SELECT r.*, d.role_idx FROM role_rows r JOIN dim d USING (rolname)),
members AS (
  SELECT m.role_oid,
    array_to_string(list_sort(list(CAST(w.role_idx AS VARCHAR))), ',') AS member_of_idxs
  FROM role_members m
  JOIN withidx w ON w.role_oid = m.member_of_oid
  GROUP BY m.role_oid
)
SELECT w.role_idx, w.role_oid, w.rolname, w.superuser, w.can_login,
  w.create_db, w.conn_limit,
  COALESCE(m.member_of_idxs, '') AS member_of_idxs
FROM withidx w
LEFT JOIN members m USING (role_oid)
ORDER BY w.role_idx
"""


# ---------------------------------------------------------------------------
# Extension fact: one row per installed extension with the database-dim
# cross-reference (output/transform/postgres.go:258-270). The reference's
# map lookup silently yields idx 0 for an unknown database oid; the
# relational form keeps the explicit -1 sentinel used by every other
# cross-reference here.
# ---------------------------------------------------------------------------


def snapshot_extension_fact(spark: SparkSession) -> DataFrame:
    exts = spark.table("extension_rows")
    dims = spark.table("databases")
    db_dim = dense_index(dims, ["database_name"], "database_idx")
    oid_to_idx = dims.join(F.broadcast(db_dim), on="database_name").select(
        "database_oid", "database_idx"
    )
    return (
        exts.join(F.broadcast(oid_to_idx), on="database_oid", how="left")
        .select(
            F.coalesce("database_idx", F.lit(-1)).cast("int").alias("database_idx"),
            "database_oid",
            F.col("extname").alias("extension_name"),
            F.col("extversion").alias("version"),
            F.col("nspname").alias("schema_name"),
        )
        .orderBy("extension_name")
    )


def oracle_snapshot_extension_fact() -> str:
    return """
WITH db_dim AS (
  SELECT database_name,
    CAST(row_number() OVER (ORDER BY database_name) - 1 AS INT) AS database_idx
  FROM (SELECT DISTINCT database_name FROM databases)
),
oid_to_idx AS (
  SELECT d.database_oid, x.database_idx
  FROM databases d JOIN db_dim x USING (database_name)
)
SELECT CAST(COALESCE(o.database_idx, -1) AS INT) AS database_idx,
  e.database_oid,
  e.extname AS extension_name,
  e.extversion AS version,
  e.nspname AS schema_name
FROM extension_rows e
LEFT JOIN oid_to_idx o USING (database_oid)
ORDER BY e.extname
"""


# ---------------------------------------------------------------------------
# Backend-count fact: BackendCountStatistic per (database, role, state,
# backend_type, waiting) group (output/transform/postgres_backend_counts.go:
# 9-76) — the dim-linked form of the S6 count aggregate.
#
# The reference's nullable DatabaseOid/RoleOid become has_database_idx /
# has_role_idx flags; a missing oid keeps idx -1 here (the explicit sentinel
# this engine uses everywhere the reference relies on proto zero values).
# The fixture's backends rows always carry oids, so system-process
# nullability is DERIVED the way pg_stat_activity actually reports it:
# walsenders have no datid, and the autovacuum worker rows stand in for the
# launcher-side processes with no usesysid. state and backend_type map to
# the protobuf enum codes (full_snapshot.proto:290-316) — unmapped strings
# fall to 0 (UNKNOWN), matching the Go switch default.
#
# Scale: the count aggregate is map-side combinable on a 5-column bounded
# key (states x types x dbs x roles); both dims are bounded per server and
# broadcast.
# ---------------------------------------------------------------------------

BACKEND_STATE_ENUM = {
    "unknown": 0,
    "active": 1,
    "idle": 2,
    "idle in transaction": 3,
    "idle in transaction (aborted)": 4,
    "fastpath function call": 5,
    "disabled": 6,
}

BACKEND_TYPE_ENUM = {
    "unknown": 0,
    "autovacuum launcher": 1,
    "autovacuum worker": 2,
    "background worker": 3,
    "background writer": 4,
    "client backend": 5,
    "checkpointer": 6,
    "startup": 7,
    "walreceiver": 8,
    "walsender": 9,
    "walwriter": 10,
    "slotsync worker": 11,
    "io worker": 12,
}


def _enum_expr(col: str, mapping: dict[str, int]):
    expr = F.lit(0)
    out = None
    for name, code in mapping.items():
        cond = F.col(col) == name
        out = F.when(cond, F.lit(code)) if out is None else out.when(cond, F.lit(code))
    return out.otherwise(expr).cast("int")


def _enum_case(col: str, mapping: dict[str, int]) -> str:
    whens = " ".join(f"WHEN '{n}' THEN {c}" for n, c in mapping.items())
    return f"CAST(CASE {col} {whens} ELSE 0 END AS INT)"


def snapshot_backend_count_fact(spark: SparkSession) -> DataFrame:
    b = spark.table("backends").select(
        F.when(F.col("backend_type") != "walsender", F.col("database_oid")).alias(
            "database_oid"
        ),
        F.when(
            F.col("backend_type") != "autovacuum worker", F.col("role_oid")
        ).alias("role_oid"),
        "state",
        "backend_type",
        "waiting",
    )
    db_dim = dense_index(
        b.filter(F.col("database_oid").isNotNull()), ["database_oid"], "database_idx"
    )
    role_dim = dense_index(
        b.filter(F.col("role_oid").isNotNull()), ["role_oid"], "role_idx"
    )
    counts = b.groupBy(
        "database_oid", "role_oid", "state", "backend_type", "waiting"
    ).agg(F.count("*").alias("backend_count"))
    order = [
        "database_idx",
        "role_idx",
        "state_enum",
        "backend_type_enum",
        "waiting_for_lock",
    ]
    return (
        counts.join(F.broadcast(db_dim), on="database_oid", how="left")
        .join(F.broadcast(role_dim), on="role_oid", how="left")
        .select(
            F.coalesce(F.col("database_idx"), F.lit(-1)).cast("int").alias(
                "database_idx"
            ),
            F.col("database_oid").isNotNull().alias("has_database_idx"),
            F.coalesce(F.col("role_idx"), F.lit(-1)).cast("int").alias("role_idx"),
            F.col("role_oid").isNotNull().alias("has_role_idx"),
            _enum_expr("state", BACKEND_STATE_ENUM).alias("state_enum"),
            _enum_expr("backend_type", BACKEND_TYPE_ENUM).alias(
                "backend_type_enum"
            ),
            F.col("waiting").alias("waiting_for_lock"),
            "backend_count",
        )
        .orderBy(*order)
    )


def oracle_snapshot_backend_count_fact() -> str:
    state_case = _enum_case("state", BACKEND_STATE_ENUM)
    type_case = _enum_case("backend_type", BACKEND_TYPE_ENUM)
    return f"""
WITH derived AS (
  SELECT
    CASE WHEN backend_type <> 'walsender' THEN database_oid END AS database_oid,
    CASE WHEN backend_type <> 'autovacuum worker' THEN role_oid END AS role_oid,
    state, backend_type, waiting
  FROM backends
),
counts AS (
  SELECT database_oid, role_oid, state, backend_type, waiting,
    CAST(COUNT(*) AS BIGINT) AS backend_count
  FROM derived GROUP BY 1, 2, 3, 4, 5
),
db_dim AS (
  SELECT database_oid,
    CAST(row_number() OVER (ORDER BY database_oid) - 1 AS INT) AS database_idx
  FROM (SELECT DISTINCT database_oid FROM derived WHERE database_oid IS NOT NULL)
),
role_dim AS (
  SELECT role_oid,
    CAST(row_number() OVER (ORDER BY role_oid) - 1 AS INT) AS role_idx
  FROM (SELECT DISTINCT role_oid FROM derived WHERE role_oid IS NOT NULL)
)
SELECT CAST(COALESCE(d.database_idx, -1) AS INT) AS database_idx,
  c.database_oid IS NOT NULL AS has_database_idx,
  CAST(COALESCE(r.role_idx, -1) AS INT) AS role_idx,
  c.role_oid IS NOT NULL AS has_role_idx,
  {state_case} AS state_enum,
  {type_case} AS backend_type_enum,
  c.waiting AS waiting_for_lock,
  c.backend_count
FROM counts c
LEFT JOIN db_dim d USING (database_oid)
LEFT JOIN role_dim r USING (role_oid)
ORDER BY database_idx, role_idx, state_enum, backend_type_enum,
  waiting_for_lock
"""
