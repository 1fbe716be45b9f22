"""Collector-config flattening (output/transform/collector_config.go:8-80):
the FullSnapshot's CollectorConfig envelope, whose only real computation is
secret hygiene — the DbUrl field carries the REDACTED connection URL
(config/config.go:437-449 GetDbURLRedacted: the password segment of the
userinfo is dropped, keeping everything else byte-identical; an
unparsable URL — control characters — becomes the literal '<unparsable>';
an empty URL stays empty), plus the effective host/port derivation
(config.go:420-435, :451-466: URL host/port win over the discrete fields,
port defaults to 5432) and has-secret booleans replacing the secret values
themselves (DbHasSslrootcert / DbHasSslkey).

The redaction goldens from config_test.go:15-22 are pinned verbatim in
tests/test_collector_config.py.

Map-only over an O(servers) relation — no shuffle beyond the determinism
orderBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# userinfo password segment: scheme '://' user ':' anything-to-'@'
_REDACT_RE = r"^([a-z][a-z0-9+.-]*://[^:/@?#]+):[^@]*@"
_HOST_RE = r"://(?:[^@/?#]*@)?([^:/?#]*)"
_PORT_RE = r"://(?:[^@/?#]*@)?[^:/?#]*:([0-9]+)"
# net/url.Parse rejects ASCII control characters (the config_test.go
# 0x7f golden)
_CTRL_RE = r"[\x00-\x1f\x7f]"

DEFAULT_PORT = 5432


def collector_config_fact(spark: SparkSession) -> DataFrame:
    c = spark.table("collector_config_rows")
    url = F.col("db_url")
    redacted = (
        F.when(url == "", F.lit(""))
        .when(url.rlike(_CTRL_RE), F.lit("<unparsable>"))
        .otherwise(F.regexp_replace(url, _REDACT_RE, "$1@"))
    )
    parsable = (url != "") & ~url.rlike(_CTRL_RE)
    url_host = F.regexp_extract(url, _HOST_RE, 1)
    url_port = F.regexp_extract(url, _PORT_RE, 1)
    return c.select(
        "server_id",
        "section_name",
        redacted.alias("db_url_redacted"),
        F.when(parsable, url_host).otherwise(F.col("db_host")).alias(
            "db_host_effective"
        ),
        F.when(parsable & (url_port != ""), url_port.cast("int"))
        .otherwise(F.lit(DEFAULT_PORT))
        .alias("db_port_effective"),
        "db_username",
        "db_name",
        "disable_logs",
        "disable_activity",
        "enable_log_explain",
        (F.col("db_sslrootcert") != "").alias("db_has_sslrootcert"),
        (F.col("db_sslkey") != "").alias("db_has_sslkey"),
        url.rlike(_REDACT_RE).alias("db_url_had_password"),
        "query_stats_interval",
        "max_collector_connections",
    ).orderBy("server_id")


def oracle_collector_config_fact() -> str:
    red = r"^([a-z][a-z0-9+.-]*://[^:/@?#]+):[^@]*@"
    host = r"://(?:[^@/?#]*@)?([^:/?#]*)"
    port = r"://(?:[^@/?#]*@)?[^:/?#]*:([0-9]+)"
    ctrl = r"[\x00-\x1f\x7f]"
    return rf"""
SELECT server_id, section_name,
  CASE WHEN db_url = '' THEN ''
       WHEN regexp_matches(db_url, '{ctrl}') THEN '<unparsable>'
       ELSE regexp_replace(db_url, '{red}', '\1@') END AS db_url_redacted,
  CASE WHEN db_url <> '' AND NOT regexp_matches(db_url, '{ctrl}')
       THEN regexp_extract(db_url, '{host}', 1)
       ELSE db_host END AS db_host_effective,
  CASE WHEN db_url <> '' AND NOT regexp_matches(db_url, '{ctrl}')
            AND regexp_extract(db_url, '{port}', 1) <> ''
       THEN CAST(regexp_extract(db_url, '{port}', 1) AS INT)
       ELSE {DEFAULT_PORT} END AS db_port_effective,
  db_username, db_name, disable_logs, disable_activity, enable_log_explain,
  db_sslrootcert <> '' AS db_has_sslrootcert,
  db_sslkey <> '' AS db_has_sslkey,
  regexp_matches(db_url, '{red}') AS db_url_had_password,
  query_stats_interval, max_collector_connections
FROM collector_config_rows
ORDER BY server_id
"""


# ---------------------------------------------------------------------------
# Collector platform envelope (output/transform/collector_platform.go:9-22
# + input/collector.go:45-72): the FullSnapshot's collector host-identity
# fields. Two real semantics beyond the copy: the virtualization system is
# reported ONLY when the host's virtualization role is 'guest'
# (collector.go:56-59), and a host.Info() failure produces the EMPTY
# envelope (zero-value CollectorPlatform, collector.go:48-52) while the
# telemetry collection aspect flips to error — both paths modeled from the
# fixture's host_info_error flag.
#
# Map-only over an O(servers) relation.
# ---------------------------------------------------------------------------


def collector_platform_fact(spark: SparkSession) -> DataFrame:
    p = spark.table("collector_platform_rows")
    err = F.col("host_info_error")
    blank = lambda c: F.when(err, F.lit("")).otherwise(F.col(c))  # noqa: E731
    virt = F.when(
        err | (F.col("virtualization_role") != "guest"), F.lit("")
    ).otherwise(F.col("virtualization_system"))
    return (
        p.select(
            "server_id",
            F.when(err, F.lit("error")).otherwise(F.lit("ok")).alias(
                "telemetry_aspect"
            ),
            # StartedAt comes from CollectionOpts, not host.Info — it
            # survives the error path (the zero-value struct zeroes it in
            # the reference only because the whole struct is discarded;
            # the envelope's timestamp field is still emitted as absent)
            F.when(err, F.lit(None).cast("long"))
            .otherwise(F.col("started_epoch"))
            .alias("started_epoch"),
            blank("architecture").alias("architecture"),
            blank("hostname").alias("hostname"),
            blank("operating_system").alias("operating_system"),
            blank("platform").alias("platform"),
            blank("platform_family").alias("platform_family"),
            blank("platform_version").alias("platform_version"),
            blank("kernel_version").alias("kernel_version"),
            virt.alias("virtualization_system"),
        )
        .orderBy("server_id")
    )


def oracle_collector_platform_fact() -> str:
    return """
SELECT server_id,
  CASE WHEN host_info_error THEN 'error' ELSE 'ok' END AS telemetry_aspect,
  CASE WHEN host_info_error THEN NULL ELSE started_epoch END AS started_epoch,
  CASE WHEN host_info_error THEN '' ELSE architecture END AS architecture,
  CASE WHEN host_info_error THEN '' ELSE hostname END AS hostname,
  CASE WHEN host_info_error THEN '' ELSE operating_system END
    AS operating_system,
  CASE WHEN host_info_error THEN '' ELSE platform END AS platform,
  CASE WHEN host_info_error THEN '' ELSE platform_family END
    AS platform_family,
  CASE WHEN host_info_error THEN '' ELSE platform_version END
    AS platform_version,
  CASE WHEN host_info_error THEN '' ELSE kernel_version END
    AS kernel_version,
  CASE WHEN host_info_error OR virtualization_role <> 'guest' THEN ''
       ELSE virtualization_system END AS virtualization_system
FROM collector_platform_rows
ORDER BY server_id
"""
