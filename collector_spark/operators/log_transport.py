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
