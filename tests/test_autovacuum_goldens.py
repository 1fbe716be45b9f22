"""Reference golden lines for the full autovacuum detail vector.

Input log lines and expected detail maps ported from the reference's
table-driven classification tests (logs/analyze_test.go:1425-1677) — real
multi-line PostgreSQL output across PG versions, exercising the
version-dependent either-or resolution paths the synthetic fixture can't
byte-match: legacy 'CPU 0.00s/0.00u sec' rusage, pinskipped+lpdead
together (PG14), anti_wraparound presence keyed on the WAL clause, and
per-index vacuum blocks."""

from __future__ import annotations

import pytest

# (content, expected-column->value); None asserts the column is NULL
# (the reference omits the Details key)
GOLDENS = [
    (
        # analyze_test.go:1425 — PG10-era: legacy rusage, rates after
        # buffers would be the 13-shape but this case has them before; no
        # WAL clause -> anti_wraparound absent
        'automatic vacuum of table "mydb.public.vac_test": index scans: 1'
        "\n pages: 0 removed, 1 remain, 0 skipped due to pins, 0 skipped frozen"
        "\n tuples: 3 removed, 6 remain, 0 are dead but not yet removable"
        "\n buffer usage: 70 hits, 4 misses, 4 dirtied"
        "\n avg read rate: 62.877 MB/s, avg write rate: 62.877 MB/s"
        "\n system usage: CPU 0.00s/0.00u sec elapsed 0.00 sec",
        {
            "aggressive": False,
            "anti_wraparound": None,
            "database": "mydb",
            "schema_name": "public",
            "relation_name": "vac_test",
            "num_index_scans": 1,
            "pages_removed": 0,
            "rel_pages": 1,
            "pinskipped_pages": 0,
            "frozenskipped_pages": 0,
            "scanned_pages": None,
            "tuples_deleted": 3,
            "new_rel_tuples": 6,
            "new_dead_tuples": 0,
            "oldest_xmin": None,
            "vacuum_page_hit": 70,
            "vacuum_page_miss": 4,
            "vacuum_page_dirty": 4,
            "read_rate_mb": 62.877,
            "write_rate_mb": 62.877,
            "wal_records": None,
            "rusage_kernel": 0.0,
            "rusage_user": 0.0,
            "elapsed_secs": 0.0,
        },
    ),
    (
        # analyze_test.go:1464 — modern rusage, oldest xmin, no WAL
        'automatic vacuum of table "demo_pgbench.public.pgbench_tellers": index scans: 0'
        " pages: 0 removed, 839 remain, 0 skipped due to pins, 705 skipped frozen"
        "\ttuples: 1849 removed, 2556 remain, 5 are dead but not yet removable, oldest xmin: 448424944"
        "\tbuffer usage: 569 hits, 1 misses, 0 dirtied"
        "\tavg read rate: 0.064 MB/s, avg write rate: 0.000 MB/s"
        "\tsystem usage: CPU: user: 0.00 s, system: 0.00 s, elapsed: 0.12 s",
        {
            "database": "demo_pgbench",
            "relation_name": "pgbench_tellers",
            "pinskipped_pages": 0,
            "frozenskipped_pages": 705,
            "tuples_deleted": 1849,
            "new_rel_tuples": 2556,
            "new_dead_tuples": 5,
            "oldest_xmin": 448424944,
            "anti_wraparound": None,
            "read_rate_mb": 0.064,
            "write_rate_mb": 0.0,
            "elapsed_secs": 0.12,
        },
    ),
    (
        # analyze_test.go:1504 — PG14: pinskipped + lpdead index scan +
        # I/O timings + WAL clause => anti_wraparound emitted as false
        'automatic vacuum of table "mydb.myschema.mytable": index scans: 0\n'
        "\tpages: 0 removed, 14761 remain, 0 skipped due to pins, 12461 skipped frozen\n"
        "\ttuples: 0 removed, 122038 remain, 14433 are dead but not yet removable, oldest xmin: 538040633\n"
        "\tindex scan bypassed: 255 pages from table (1.73% of total) have 661 dead item identifiers\n"
        "\tI/O timings: read: 0.000 ms, write: 0.000 ms\n"
        "\tavg read rate: 0.000 MB/s, avg write rate: 0.000 MB/s\n"
        "\tbuffer usage: 4420 hits, 0 misses, 0 dirtied\n"
        "\tWAL usage: 1 records, 0 full page images, 245 bytes\n"
        "\tsystem usage: CPU: user: 0.00 s, system: 0.00 s, elapsed: 0.01 s",
        {
            "aggressive": False,
            "anti_wraparound": False,
            "schema_name": "myschema",
            "pinskipped_pages": 0,
            "frozenskipped_pages": 12461,
            "lpdead_index_scan": "bypassed",
            "lpdead_item_pages": 255,
            "lpdead_item_page_percent": 1.73,
            "lpdead_items": 661,
            "blk_read_time": 0.0,
            "blk_write_time": 0.0,
            "wal_records": 1,
            "wal_fpi": 0,
            "wal_bytes": 245,
            "oldest_xmin": 538040633,
        },
    ),
    (
        # analyze_test.go:1557 — anti-wraparound aggressive, modern rusage
        # mapping: kernel comes from 'system', user from 'user'
        'automatic aggressive vacuum to prevent wraparound of table "mydb.myschema.mytable": index scans: 0\n'
        "\tpages: 0 removed, 241245 remain, 0 skipped due to pins, 241244 skipped frozen\n"
        "\ttuples: 0 removed, 17418745 remain, 0 are dead but not yet removable, oldest xmin: 538040633\n"
        "\tindex scan not needed: 3 pages from table (0.01% of total) had 0 dead item identifiers removed\n"
        "\tI/O timings: read: 10.540 ms, write: 0.000 ms\n"
        "\tavg read rate: 38.748 MB/s, avg write rate: 0.538 MB/s\n"
        "\tbuffer usage: 50 hits, 72 misses, 1 dirtied\n"
        "\tWAL usage: 1 records, 1 full page images, 2147 bytes\n"
        "\tsystem usage: CPU: user: 1.23 s, system: 4.56 s, elapsed: 0.01 s",
        {
            "aggressive": True,
            "anti_wraparound": True,
            "lpdead_index_scan": "not needed",
            "blk_read_time": 10.54,
            "read_rate_mb": 38.748,
            "write_rate_mb": 0.538,
            "rusage_user": 1.23,
            "rusage_kernel": 4.56,
            "elapsed_secs": 0.01,
        },
    ),
    (
        # analyze_test.go:1610 — per-index vacuum details block
        'automatic aggressive vacuum to prevent wraparound of table "mydb.myschema.mytable": index scans: 1\n'
        "\tpages: 8141555 removed, 4783594 remain, 0 skipped due to pins, 10478504 skipped frozen\n"
        "\ttuples: 2153407 removed, 44326634 remain, 252 are dead but not yet removable, oldest xmin: 1887899920\n"
        "\tindex scan needed: 808328 pages from table (6.25% of total) had 2317145 dead item identifiers removed\n"
        '\tindex "mytable_index1": pages: 235675 in total, 5967 newly deleted, 174124 currently deleted, 168157 reusable\n'
        '\tindex "mytable_index2": pages: 179 in total, 0 newly deleted, 0 currently deleted, 0 reusable\n'
        "\tI/O timings: read: 377482.257 ms, write: 8483.639 ms\n"
        "\tavg read rate: 104.788 MB/s, avg write rate: 19.082 MB/s\n"
        "\tbuffer usage: 2692149 hits, 11619539 misses, 2115983 dirtied\n"
        "\tWAL usage: 1 records, 1 full page images, 2147 bytes\n"
        "\tsystem usage: CPU: user: 1.23 s, system: 4.56 s, elapsed: 0.01 s",
        {
            "pages_removed": 8141555,
            "rel_pages": 4783594,
            "lpdead_index_scan": "needed",
            "lpdead_items": 2317145,
            "blk_read_time": 377482.257,
        },
    ),
]


@pytest.fixture(scope="module")
def golden_rows(prepared_spark):
    from collector_spark.logs.classify import _autovacuum_full_from

    lines = prepared_spark.createDataFrame(
        [(1, i, "LOG", content) for i, (content, _) in enumerate(GOLDENS)],
        "pid int, seq long, log_level string, content string",
    )
    rows = _autovacuum_full_from(lines).collect()
    return {r["seq"]: r.asDict() for r in rows}


def test_every_golden_line_matches(golden_rows):
    assert len(golden_rows) == len(GOLDENS)


@pytest.mark.parametrize("idx", range(len(GOLDENS)))
def test_golden_details(golden_rows, idx):
    _, expected = GOLDENS[idx]
    got = golden_rows[idx]
    for key, want in expected.items():
        have = got[key]
        if isinstance(want, float):
            assert have == pytest.approx(want, abs=1e-9), (key, have, want)
        else:
            assert have == want, (key, have, want)


def test_golden_index_vacuum_explode(prepared_spark):
    """The per-index block of analyze_test.go:1610 explodes to the same
    entries the reference's index_vacuums map carries."""
    from collector_spark.logs import classify as C
    from pyspark.sql import functions as F

    content = GOLDENS[4][0]
    lines = prepared_spark.createDataFrame(
        [(1, 0, content)], "pid int, seq long, content string"
    )
    entries = (
        lines.select(
            F.explode(
                F.regexp_extract_all(
                    F.col("content"), F.lit(C.INDEX_VACUUM_ENTRY_RE), F.lit(0)
                )
            ).alias("entry")
        )
        .select(
            F.regexp_extract("entry", C.INDEX_VACUUM_ENTRY_RE, 1).alias("name"),
            F.regexp_extract("entry", C.INDEX_VACUUM_ENTRY_RE, 2).cast("long").alias("num_pages"),
            F.regexp_extract("entry", C.INDEX_VACUUM_ENTRY_RE, 3).cast("long").alias("newly"),
            F.regexp_extract("entry", C.INDEX_VACUUM_ENTRY_RE, 4).cast("long").alias("deleted"),
            F.regexp_extract("entry", C.INDEX_VACUUM_ENTRY_RE, 5).cast("long").alias("free"),
        )
        .collect()
    )
    got = {r["name"]: (r["num_pages"], r["newly"], r["deleted"], r["free"]) for r in entries}
    assert got == {
        "mytable_index1": (235675, 5967, 174124, 168157),
        "mytable_index2": (179, 0, 0, 0),
    }


# ---------------------------------------------------------------------------
# Checkpoint-complete goldens (logs/analyze_test.go:606-655): PG9/10 WAL-vs-
# transaction-log wording, PG18 SLRU + lsn pair. The reference renders
# absent optionals as zero/"" in its Details map; the engine's declared
# contract is NULL for absent clauses — asserted as such.
# ---------------------------------------------------------------------------

CKPT_GOLDENS = [
    (
        "checkpoint complete: wrote 111906 buffers (10.9%); 0 WAL file(s) added,"
        " 22 removed, 29 recycled; write=215.895 s, sync=0.014 s, total=216.130 s;"
        " sync files=94, longest=0.014 s, average=0.000 s;"
        " distance=850730 kB, estimate=910977 kB",
        {
            "bufs_written": 111906, "bufs_written_pct": 10.9,
            "segs_added": 0, "segs_removed": 22, "segs_recycled": 29,
            "write_secs": 215.895, "sync_secs": 0.014, "total_secs": 216.130,
            "sync_rels": 94, "longest_secs": 0.014, "average_secs": 0.0,
            "distance_kb": 850730, "estimate_kb": 910977,
            "slru_buffers": None, "lsn": None, "redo_lsn": None,
        },
    ),
    (
        # pre-PG10 wording: 'transaction log file(s)'
        "checkpoint complete: wrote 111906 buffers (10.9%); 0 transaction log"
        " file(s) added, 22 removed, 29 recycled; write=215.895 s, sync=0.014 s,"
        " total=216.130 s; sync files=94, longest=0.014 s, average=0.000 s;"
        " distance=850730 kB, estimate=910977 kB",
        {"bufs_written": 111906, "segs_removed": 22, "estimate_kb": 910977},
    ),
    (
        # PG18: SLRU clause + lsn pair
        "checkpoint complete: wrote 3 buffers (0.0%), wrote 0 SLRU buffers;"
        " 0 WAL file(s) added, 0 removed, 0 recycled; write=0.302 s,"
        " sync=0.015 s, total=0.353 s; sync files=2, longest=0.015 s,"
        " average=0.008 s; distance=22 kB, estimate=832327 kB;"
        " lsn=1/D72C34D0, redo lsn=1/D72C3478",
        {
            "bufs_written": 3, "bufs_written_pct": 0.0, "slru_buffers": 0,
            "write_secs": 0.302, "average_secs": 0.008, "distance_kb": 22,
            "estimate_kb": 832327, "lsn": "1/D72C34D0", "redo_lsn": "1/D72C3478",
        },
    ),
]


@pytest.mark.parametrize("idx", range(len(CKPT_GOLDENS)))
def test_checkpoint_goldens(prepared_spark, idx):
    from collector_spark.logs.classify import _checkpoint_details_from

    content, expected = CKPT_GOLDENS[idx]
    lines = prepared_spark.createDataFrame(
        [(1, 0, "LOG", content)],
        "pid int, seq long, log_level string, content string",
    )
    rows = _checkpoint_details_from(lines).collect()
    assert len(rows) == 1, content[:80]
    got = rows[0].asDict()
    for key, want in expected.items():
        have = got[key]
        if isinstance(want, float):
            assert have == pytest.approx(want, abs=1e-9), (key, have, want)
        else:
            assert have == want, (key, have, want)


def test_deadlock_participant_regex_matches_reference_block():
    """The multi-line participant block of logs/analyze_test.go:1066-1070
    must yield the reference's RelatedPids order [9788, 91, 98, 91] with
    statement text on the statement-shaped lines."""
    import re

    from collector_spark.logs.classify import DEADLOCK_DETAIL_RE

    block = (
        "Process 9788 waits for ShareLock on transaction 1035; blocked by process 91."
        "\nProcess 91 waits for ShareLock on transaction 1045; blocked by process 98.\n"
        "\nProcess 98: INSERT INTO x (id, name, email) VALUES (1, 'ABC',"
        " 'abc@example.com') ON CONFLICT(email) DO UPDATE SET name ="
        " excluded.name, /* truncated */"
        "\nProcess 91: INSERT INTO x (id, name, email) VALUES (1, 'ABC',"
        " 'abc@example.com') ON CONFLICT(email) DO UPDATE SET name ="
        " excluded.name, /* truncated */"
    )
    matches = re.findall(DEADLOCK_DETAIL_RE, block)
    assert [int(p) for p, _ in matches] == [9788, 91, 98, 91]
    stmts = [s for _, s in matches if s]
    assert len(stmts) == 2 and all(s.startswith("INSERT INTO x") for s in stmts)


# ---------------------------------------------------------------------------
# Lock-wait goldens (logs/analyze_test.go:926, :1121, :1137): the lock-on
# text after the type is arbitrary — plain transaction, virtual
# transaction, advisory-lock brackets — and the wait-family type remaps to
# pg_locks.locktype names (transaction->transactionid, virtual->virtualxid;
# advisory passes through), exactly analyze.go:1483-1490.
# ---------------------------------------------------------------------------

LOCK_GOLDENS = [
    (
        "process 2078 still waiting for ShareLock on transaction 1045207414 after 1000.100 ms",
        {"lock_pid": 2078, "outcome": "still waiting", "lock_mode": "ShareLock",
         "lock_type": "transactionid", "after_ms": 1000.100},
    ),
    (
        "process 663 still waiting for ShareLock on virtual transaction 2/7 after 1000.123 ms",
        {"lock_pid": 663, "lock_mode": "ShareLock",
         "lock_type": "virtualxid", "after_ms": 1000.123},
    ),
    (
        "process 663 still waiting for ExclusiveLock on advisory lock [233136,1,2,2] after 1000.365 ms",
        {"lock_pid": 663, "lock_mode": "ExclusiveLock",
         "lock_type": "advisory", "after_ms": 1000.365},
    ),
    (
        # acquired rows pass the raw type through unmapped
        "process 583 acquired AccessExclusiveLock on relation 16396 of database 16384 after 2003.518 ms",
        {"lock_pid": 583, "outcome": "acquired", "lock_mode": "AccessExclusiveLock",
         "lock_type": "relation", "after_ms": 2003.518},
    ),
]


@pytest.mark.parametrize("idx", range(len(LOCK_GOLDENS)))
def test_lock_goldens(prepared_spark, idx):
    from collector_spark.logs.classify import _lock_details_from

    content, expected = LOCK_GOLDENS[idx]
    lines = prepared_spark.createDataFrame(
        [(1, 0, "LOG", content)],
        "pid int, seq long, log_level string, content string",
    )
    rows = _lock_details_from(lines).collect()
    assert len(rows) == 1, content[:80]
    got = rows[0].asDict()
    for key, want in expected.items():
        have = got[key]
        if isinstance(want, float):
            assert have == pytest.approx(want, abs=1e-9), (key, have, want)
        else:
            assert have == want, (key, have, want)


# ---------------------------------------------------------------------------
# Connection / session / temp-file / worker-exit goldens
# (logs/analyze_test.go:258-330, :2458-2474, :2639-2657).
# ---------------------------------------------------------------------------


def _single(prepared_spark, fn, content):
    lines = prepared_spark.createDataFrame(
        [(1, 0, "LOG", content)],
        "pid int, seq long, log_level string, content string",
    )
    rows = fn(lines).collect()
    assert len(rows) == 1, content[:80]
    return rows[0].asDict()


def test_connection_goldens(prepared_spark):
    from collector_spark.logs.classify import _connection_details_from

    host_cases = [
        ("connection received: host=172.30.0.165 port=56902", "172.30.0.165"),
        (
            "connection received: host=ec2-102-13-140-150.compute-1.amazonaws.com port=12345",
            "ec2-102-13-140-150.compute-1.amazonaws.com",
        ),
        ("connection received: host=[local]", "[local]"),
    ]
    for content, host in host_cases:
        got = _single(prepared_spark, _connection_details_from, content)
        assert got["host"] == host, content
        assert got["ssl_protocol"] is None
    ssl = _single(
        prepared_spark,
        _connection_details_from,
        "connection authorized: user=myuser database=mydb SSL enabled"
        " (protocol=TLSv1.2, cipher=ECDHE-RSA-AES256-GCM-SHA384, compression=off)",
    )
    assert ssl["ssl_protocol"] == "TLSv1.2" and ssl["kind"] == "authorized"
    # authorized without SSL clause -> no ssl_protocol detail
    plain = _single(
        prepared_spark,
        _connection_details_from,
        "connection authorized: user=myuser database=myuser"
        " application_name=puma: cluster worker 2: 44125 [myapp]",
    )
    assert plain["ssl_protocol"] is None and plain["kind"] == "authorized"


def test_session_time_golden(prepared_spark):
    from collector_spark.logs.classify import _session_details_from

    got = _single(
        prepared_spark,
        _session_details_from,
        "disconnection: session time: 1:53:01.198 user=myuser database=mydb"
        " host=172.30.0.165 port=56902",
    )
    assert got["session_time_secs"] == pytest.approx(6781.198, abs=1e-9)


def test_tempfile_golden(prepared_spark):
    from collector_spark.logs.classify import _tempfile_details_from

    got = _single(
        prepared_spark,
        _tempfile_details_from,
        'temporary file: path "base/pgsql_tmp/pgsql_tmp15967.0", size 200204288',
    )
    assert got["file"] == "base/pgsql_tmp/pgsql_tmp15967.0"
    assert got["size"] == 200204288


def test_worker_exit_parallel_golden(prepared_spark):
    from collector_spark.logs.classify import _worker_exit_details_from

    got = _single(
        prepared_spark,
        _worker_exit_details_from,
        "worker process: parallel worker for PID 30491 (PID 31458)"
        " exited with exit code 1",
    )
    assert got["process_type"] == "parallel worker"
    assert got["process_pid"] == 31458
    assert got["parent_pid"] == 30491
    assert got["exit_code"] == 1
    assert got["signal"] is None


# ---------------------------------------------------------------------------
# Wraparound / archiver goldens (logs/analyze_test.go:783-800, :1319-1400):
# OID-vs-name alternation on both the warning and error forms, and the
# archive-command exit-code path.
# ---------------------------------------------------------------------------


def test_wraparound_goldens(prepared_spark):
    from collector_spark.logs.classify import _wraparound_details_from

    by_name = _single(
        prepared_spark,
        _wraparound_details_from,
        'database "template1" must be vacuumed within 938860 transactions',
    )
    assert by_name["kind"] == "warning"
    assert by_name["database_name"] == "template1"
    assert by_name["database_oid"] is None
    assert by_name["remaining_xids"] == 938860

    by_oid = _single(
        prepared_spark,
        _wraparound_details_from,
        "database with OID 10 must be vacuumed within 100 transactions",
    )
    assert by_oid["database_oid"] == 10 and by_oid["database_name"] is None
    assert by_oid["remaining_xids"] == 100

    err = _single(
        prepared_spark,
        _wraparound_details_from,
        "database is not accepting commands to avoid wraparound data loss"
        ' in database "mydb"',
    )
    assert err["kind"] == "error" and err["database_name"] == "mydb"
    assert err["remaining_xids"] is None

    err_oid = _single(
        prepared_spark,
        _wraparound_details_from,
        "database is not accepting commands to avoid wraparound data loss"
        " in database with OID 16384",
    )
    assert err_oid["database_oid"] == 16384


def test_archiver_exit_code_golden(prepared_spark):
    from collector_spark.logs.classify import archiver_details  # noqa: F401
    import re

    from collector_spark.logs.classify import ARCHIVE_RE

    m = re.search(ARCHIVE_RE, "archive command failed with exit code 1")
    assert m and m.group(1) == "1" and not m.group(2)
    m2 = re.search(
        ARCHIVE_RE, "archive command was terminated by signal 9: Killed"
    )
    assert m2 and not m2.group(1) and m2.group(2) == "9"
