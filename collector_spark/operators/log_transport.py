"""S31 cloud log transport: the RDS download planner as a relational op.

The reference downloads RDS log files portion-by-portion, resuming each
file from a persisted pagination marker and keeping at most the trailing
``maxLogParsingSize`` (10 MB) bytes of what it fetched
(input/system/rds/logs.go:28, :70-104; marker state:
state/logs.go AwsMarkers, persisted across runs). The syslog / GCP /
Azure / Heroku receivers feed the same downstream pipeline and differ only
in transport plumbing; the marker-resumption + trailing-cap decision logic
IS the computable core, and it is pure windows/joins:

  1. resume:   keep portions with seq > COALESCE(prev marker, 0)
  2. cap:      suffix running sum of bytes (window ordered by seq DESC);
               a portion survives fully while the suffix sum fits the cap,
               the boundary portion is clipped, earlier ones are dropped —
               exactly the shift-left buffer in logs.go:85-100
  3. marker:   advances to the last downloaded portion even when content
               was clipped (the reference keeps lastMarker from the API
               response regardless of truncation); files with nothing new
               carry their previous marker forward

Per-file plan output feeds the file-tail source (streaming/file_tail.py)
in a real deployment; here it is driver-verifiable against a DuckDB oracle
over the same fixture manifest.

Scale: one window + one groupBy, both partitioned by file_name — the
natural parallel unit (the reference loops files sequentially; Spark does
them all at once). No broadcast needed: portions and markers co-partition
on the join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# fixture-scaled stand-in for maxLogParsingSize (10 MB in the reference —
# logs.go:28); small enough that the fixture actually exercises clipping
MAX_KEEP_BYTES = 16384


def rds_download_plan(spark: SparkSession) -> DataFrame:
    portions = spark.table("rds_portions")
    markers = spark.table("rds_prev_markers")

    new_p = portions.join(markers, "file_name", "left").filter(
        F.col("seq") > F.coalesce(F.col("marker_seq"), F.lit(0))
    )
    w_suffix = (
        Window.partitionBy("file_name")
        .orderBy(F.desc("seq"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    suffix_bytes = F.sum("byte_len").over(w_suffix).cast("long")
    cap = F.lit(MAX_KEEP_BYTES)
    kept = (
        F.when(suffix_bytes <= cap, F.col("byte_len"))
        .when(suffix_bytes - F.col("byte_len") < cap, cap - (suffix_bytes - F.col("byte_len")))
        .otherwise(F.lit(0))
    )
    per_file = (
        new_p.withColumn("kept_bytes", kept)
        .groupBy("file_name")
        .agg(
            F.count("*").cast("long").alias("portions_downloaded"),
            F.sum("byte_len").cast("long").alias("bytes_downloaded"),
            F.sum("kept_bytes").cast("long").alias("bytes_kept"),
            F.max("seq").cast("long").alias("max_new_seq"),
        )
    )
    files = portions.select("file_name").distinct()
    return (
        files.join(per_file, "file_name", "left")
        .join(markers, "file_name", "left")
        .select(
            "file_name",
            F.coalesce(F.col("portions_downloaded"), F.lit(0).cast("long")).alias(
                "portions_downloaded"
            ),
            F.coalesce(F.col("bytes_downloaded"), F.lit(0).cast("long")).alias(
                "bytes_downloaded"
            ),
            F.coalesce(F.col("bytes_kept"), F.lit(0).cast("long")).alias("bytes_kept"),
            (
                F.coalesce(F.col("bytes_downloaded"), F.lit(0))
                > F.coalesce(F.col("bytes_kept"), F.lit(0))
            ).alias("truncated"),
            F.coalesce(F.col("max_new_seq"), F.col("marker_seq")).alias(
                "new_marker_seq"
            ),
        )
        .orderBy("file_name")
    )


# trailing read cap for pg_read_file (10 MB, log_pg_read_file.go:17-24);
# fixture-scaled so the GREATEST branch is actually exercised
PG_READ_CAP_BYTES = 10 * 1024 * 1024


def pg_read_file_plan(spark: SparkSession) -> DataFrame:
    """S31 self-hosted source: the ``pg_read_file`` polling planner
    (input/postgres/log_pg_read_file.go:15-124). Per recently-modified log
    file (pg_ls_logdir, modified within 2 minutes) the reference reads from
    GREATEST(size - 10MB, previous marker) for at most 10 MB and persists
    the file's current size as the new marker. Pure projection + one
    co-partitioned left join — the whole poll across all files/servers is
    one map stage."""
    files = spark.table("pg_log_files").filter(F.col("modified_secs_ago") <= 120)
    markers = spark.table("pg_prev_offsets")
    cap = F.lit(PG_READ_CAP_BYTES).cast("long")
    prev = F.coalesce(F.col("prev_offset"), F.lit(0)).cast("long")
    offset = F.greatest(F.col("size_bytes") - cap, prev)
    read_len = F.greatest(
        F.least(cap, F.col("size_bytes") - offset), F.lit(0).cast("long")
    )
    return (
        files.join(markers, "file_name", "left")
        .select(
            "file_name",
            offset.alias("read_offset"),
            read_len.alias("read_len"),
            (F.col("size_bytes") - prev > cap).alias("skipped_to_tail"),
            F.col("size_bytes").alias("new_marker"),
        )
        .orderBy("file_name")
    )


def oracle_pg_read_file_plan() -> str:
    cap = PG_READ_CAP_BYTES
    return f"""
SELECT f.file_name,
  GREATEST(f.size_bytes - {cap}, COALESCE(m.prev_offset, 0)) AS read_offset,
  GREATEST(LEAST(CAST({cap} AS BIGINT),
           f.size_bytes - GREATEST(f.size_bytes - {cap}, COALESCE(m.prev_offset, 0))),
           0) AS read_len,
  f.size_bytes - COALESCE(m.prev_offset, 0) > {cap} AS skipped_to_tail,
  f.size_bytes AS new_marker
FROM pg_log_files f
LEFT JOIN pg_prev_offsets m USING (file_name)
WHERE f.modified_secs_ago <= 120
ORDER BY f.file_name
"""


def oracle_rds_download_plan() -> str:
    cap = MAX_KEEP_BYTES
    return f"""
WITH new_p AS (
  SELECT p.file_name, p.seq, p.byte_len,
         CAST(SUM(p.byte_len) OVER (PARTITION BY p.file_name ORDER BY p.seq DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS suffix_bytes
  FROM rds_portions p
  LEFT JOIN rds_prev_markers m USING (file_name)
  WHERE p.seq > COALESCE(m.marker_seq, 0)
),
per_file AS (
  SELECT file_name,
         CAST(COUNT(*) AS BIGINT) AS portions_downloaded,
         CAST(SUM(byte_len) AS BIGINT) AS bytes_downloaded,
         CAST(SUM(CASE WHEN suffix_bytes <= {cap} THEN byte_len
                       WHEN suffix_bytes - byte_len < {cap} THEN {cap} - (suffix_bytes - byte_len)
                       ELSE 0 END) AS BIGINT) AS bytes_kept,
         CAST(MAX(seq) AS BIGINT) AS max_new_seq
  FROM new_p GROUP BY file_name
),
files AS (SELECT DISTINCT file_name FROM rds_portions)
SELECT f.file_name,
       COALESCE(pf.portions_downloaded, CAST(0 AS BIGINT)) AS portions_downloaded,
       COALESCE(pf.bytes_downloaded, CAST(0 AS BIGINT)) AS bytes_downloaded,
       COALESCE(pf.bytes_kept, CAST(0 AS BIGINT)) AS bytes_kept,
       COALESCE(pf.bytes_downloaded, 0) > COALESCE(pf.bytes_kept, 0) AS truncated,
       COALESCE(pf.max_new_seq, m.marker_seq) AS new_marker_seq
FROM files f
LEFT JOIN per_file pf USING (file_name)
LEFT JOIN rds_prev_markers m USING (file_name)
ORDER BY f.file_name
"""
