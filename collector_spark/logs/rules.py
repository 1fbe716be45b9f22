"""U7 classification rule table — ported from logs/analyze.go:33-1183.

Each rule is DATA consumed three ways:
  1. the Spark when-chain (classify.py) — prefix short-circuit + rlike,
  2. the generated DuckDB oracle CASE (same renderer, other dialect),
  3. the log_raw fixture's sample generator (fixtures/defs.py) — every rule
     contributes a deterministic sample line, so the fixture provably covers
     every rule family and the rule table cannot silently rot.

Regex dialect: the subset common to Java regex (Spark rlike/regexp_extract)
and RE2 (DuckDB): no lookarounds, no named groups, identical capture
numbering. Patterns follow the reference regexes (line refs inline).

``sample`` is a dialect-neutral SQL expression over the events columns
(event_id, user_id, value) rendering one matching line body.
"""

from __future__ import annotations

from dataclasses import dataclass

_EID = "CAST(event_id % 300 AS STRING)"
_UID = "CAST(user_id % 50 AS STRING)"
_DB = "CAST(user_id % 5 AS STRING)"
_HOST = "CAST(user_id % 255 AS STRING)"
_MS = "CAST(CAST(value AS DECIMAL(12,2)) AS STRING)"
_N = "CAST(event_id % 5000 AS STRING)"


@dataclass(frozen=True)
class Rule:
    # literal short-circuit(s) (analyze.go:2195-2202). The reference attaches
    # a *list* of prefixes per rule (e.g. {"checkpoint","restartpoint"},
    # {"statement: ","execute "}); a single str here is the common 1-element
    # case. Every consumer goes through ``prefixes``.
    prefix: str | tuple[str, ...]
    regex: str           # classification + capture regex
    classification: str
    level: str           # log level the sample renders with
    sample: str          # SQL expr producing a matching content body
    num_group: int = 0   # capture group for detail_num (0 = none)
    text_group: int = 0  # capture group for detail_text (0 = none)

    @property
    def prefixes(self) -> tuple[str, ...]:
        return self.prefix if isinstance(self.prefix, tuple) else (self.prefix,)


def _autovacuum_sample() -> str:
    """Autovacuum completion body cycling SIX PostgreSQL-version shapes by
    event_id % 6 — the clause combinations the reference's 62-group regex
    (analyze.go:81-108) tolerates:

      v0  legacy-hybrid (the repo's original PG14-subset shape; keeps the
          u7b subset extractor exercised)
      v1  PG10-12: pinskipped/frozenskipped pages, oldest xmin, rates after
          buffer usage, no WAL clause, legacy 'CPU 0.1s/0.2u sec' rusage
      v2  PG14: scanned pages, lpdead index-scan status, per-index vacuum
          details, I/O timings, rates before buffers, WAL usage
      v3  PG15: missed dead tuples, removable cutoff + age, new
          relfrozenxid/relminmxid advancement
      v4  PG16/18: eagerly-scanned pages, frozen-pages clause, visibility
          map clause, WAL buffers-full counter
      v5  AlloyDB: elapsed-time clause, mintxid skip clause,
          max_dead_tuples, prefetch suffix (shape tolerance; no details)

    The full-vector extractor (classify.autovacuum_full_details) resolves
    every version-dependent either-or over these lines.
    """
    head = (
        "'automatic ' || CASE WHEN event_id % 11 = 0 THEN 'aggressive ' ELSE '' END"
        " || 'vacuum ' || CASE WHEN event_id % 5 = 0 THEN 'to prevent wraparound ' ELSE '' END"
        f" || 'of table \"db_' || {_DB} || '.public.rel_' || {_EID}"
        " || '\": index scans: ' || CAST(event_id % 4 AS STRING) || ','"
    )
    pages = (
        "' pages: ' || CAST(event_id % 100 AS STRING) || ' removed, '"
        " || CAST(1000 + event_id % 9000 AS STRING) || ' remain,'"
    )
    scanned = (
        "' ' || CAST(800 + event_id % 5000 AS STRING) || ' scanned ('"
        " || CAST(CAST(event_id % 100 AS DECIMAL(5,2)) AS STRING) || '% of total)'"
    )
    eagerly = "', ' || CAST(event_id % 60 AS STRING) || ' eagerly scanned'"
    pins = (
        "' ' || CAST(event_id % 9 AS STRING) || ' skipped due to pins, '"
        " || CAST(event_id % 17 AS STRING) || ' skipped frozen'"
    )
    tuples = (
        "' tuples: ' || CAST(event_id % 500 AS STRING) || ' removed, '"
        " || CAST(2000 + event_id % 8000 AS STRING) || ' remain, '"
        " || CAST(event_id % 50 AS STRING) || ' are dead but not yet removable'"
    )
    oldxmin = "', oldest xmin: ' || CAST(100000 + event_id AS STRING)"
    missed = (
        "' tuples missed: ' || CAST(event_id % 40 AS STRING) || ' dead from '"
        " || CAST(event_id % 20 AS STRING)"
        " || ' pages not removed due to cleanup lock contention,'"
    )
    cutoff = (
        "' removable cutoff: ' || CAST(200000 + event_id AS STRING)"
        " || ', which was ' || CAST(event_id % 999 AS STRING)"
        " || ' XIDs old when operation ended,'"
    )
    frozenxid = (
        "' new relfrozenxid: ' || CAST(150000 + event_id AS STRING)"
        " || ', which is ' || CAST(1 + event_id % 5000 AS STRING)"
        " || ' XIDs ahead of previous value,'"
    )
    minmxid = (
        "' new relminmxid: ' || CAST(90000 + event_id AS STRING)"
        " || ', which is ' || CAST(1 + event_id % 700 AS STRING)"
        " || ' MXIDs ahead of previous value,'"
    )
    frozen = (
        "' frozen: ' || CAST(event_id % 300 AS STRING)"
        " || ' pages from table (' || CAST(CAST(event_id % 90 AS DECIMAL(5,2)) AS STRING)"
        " || '% of total) had ' || CAST(event_id % 4000 AS STRING) || ' tuples frozen,'"
    )
    vm = (
        "' visibility map: ' || CAST(event_id % 500 AS STRING)"
        " || ' pages set all-visible, ' || CAST(event_id % 450 AS STRING)"
        " || ' pages set all-frozen (' || CAST(event_id % 200 AS STRING)"
        " || ' were all-visible)'"
    )
    idxscan = (
        "' index scan ' || CASE CAST(event_id % 4 AS INT)"
        " WHEN 0 THEN 'not needed' WHEN 1 THEN 'needed'"
        " WHEN 2 THEN 'bypassed' ELSE 'bypassed by failsafe' END"
        " || ': ' || CAST(event_id % 800 AS STRING)"
        " || ' pages from table (' || CAST(CAST(event_id % 70 AS DECIMAL(5,2)) AS STRING)"
        " || '% of total) had ' || CAST(event_id % 900 AS STRING)"
        " || ' dead item identifiers removed,'"
    )
    idxdet = (
        "' index \"rel_' || " + _EID + " || '_pkey\": pages: '"
        " || CAST(100 + event_id % 900 AS STRING) || ' in total, '"
        " || CAST(event_id % 30 AS STRING) || ' newly deleted, '"
        " || CAST(event_id % 40 AS STRING) || ' currently deleted, '"
        " || CAST(event_id % 25 AS STRING) || ' reusable,'"
        " || ' index \"rel_' || " + _EID + " || '_ix2\": pages: '"
        " || CAST(50 + event_id % 400 AS STRING) || ' in total, '"
        " || CAST(event_id % 7 AS STRING) || ' newly deleted, '"
        " || CAST(event_id % 11 AS STRING) || ' currently deleted, '"
        " || CAST(event_id % 5 AS STRING) || ' reusable,'"
    )
    iotim = (
        "' I/O timings: read: ' || CAST(CAST(event_id % 700 AS DECIMAL(7,3)) AS STRING)"
        " || ' ms, write: ' || CAST(CAST(event_id % 300 AS DECIMAL(7,3)) AS STRING) || ' ms,'"
    )
    rates = (
        "' avg read rate: ' || CAST(CAST(event_id % 80 AS DECIMAL(6,1)) AS STRING)"
        " || ' MB/s, avg write rate: ' || CAST(CAST(event_id % 40 AS DECIMAL(6,1)) AS STRING)"
        " || ' MB/s,'"
    )
    buffers = (
        "' buffer usage: ' || CAST(event_id % 4000 AS STRING) || ' hits, '"
        " || CAST(event_id % 300 AS STRING)"
        " || CASE WHEN event_id % 2 = 0 THEN ' misses, ' ELSE ' reads, ' END"
        " || CAST(event_id % 200 AS STRING) || ' dirtied,'"
    )
    wal = (
        "' WAL usage: ' || CAST(event_id % 7000 AS STRING) || ' records, '"
        " || CAST(event_id % 90 AS STRING) || ' full page images, '"
        " || CAST(event_id * 13 % 100000 AS STRING) || ' bytes,'"
    )
    walfull = "' ' || CAST(event_id % 64 AS STRING) || ' buffers full'"
    cpu_new = (
        "' system usage: CPU: user: ' || CAST(CAST(event_id % 10 AS DECIMAL(5,2)) AS STRING)"
        " || ' s, system: ' || CAST(CAST(event_id % 5 AS DECIMAL(5,2)) AS STRING)"
        " || ' s, elapsed: ' || CAST(CAST(event_id % 30 AS DECIMAL(5,2)) AS STRING) || ' s'"
    )
    cpu_old = (
        "' system usage: CPU ' || CAST(CAST(event_id % 5 AS DECIMAL(4,2)) AS STRING)"
        " || 's/' || CAST(CAST(event_id % 9 AS DECIMAL(4,2)) AS STRING)"
        " || 'u sec elapsed ' || CAST(CAST(event_id % 30 AS DECIMAL(4,2)) AS STRING) || ' sec'"
    )
    alloy_elapsed = (
        "' elapsed time: ' || CAST(event_id % 90 AS STRING)"
        " || ' s, index vacuum time: ' || CAST(event_id % 30 AS STRING) || ' s,'"
    )
    alloy_mintxid = (
        "' ' || CAST(event_id % 70 AS STRING) || ' skipped using mintxid '"
        " || CAST(event_id % 50 AS STRING) || ' skipped pages due to vm all-visible, '"
        " || CAST(event_id % 600 AS STRING) || ' nonempty pages,'"
    )
    alloy_maxdead = "' max_dead_tuples:' || CAST(1000 + event_id % 9000 AS STRING) || ','"
    alloy_prefetch = (
        "' prefetch hit: ' || CAST(event_id % 100 AS STRING)"
        " || ' prefetch io: ' || CAST(event_id % 60 AS STRING)"
        " || ' second prefetch hit: ' || CAST(event_id % 30 AS STRING)"
        " || ' second prefetch io: ' || CAST(event_id % 15 AS STRING)"
    )

    def cat(*parts: str) -> str:
        return " || ".join(parts)

    v0 = cat(pages, tuples,
             f"CASE WHEN event_id % 2 = 0 THEN {oldxmin} ELSE '' END",
             "','", buffers, rates, wal, cpu_new)
    v1 = cat(pages, pins, tuples, oldxmin, "','", buffers, rates, cpu_old)
    v2 = cat(pages, scanned, "','", tuples, oldxmin, "','", idxscan, idxdet,
             iotim, rates, buffers, wal, cpu_new)
    v3 = cat(pages, scanned, "','", tuples, missed, cutoff, frozenxid,
             minmxid, idxscan, iotim, rates, buffers, wal, cpu_new)
    v4 = cat(pages, scanned, eagerly, "','", tuples, cutoff, frozen, vm,
             idxscan, idxdet, rates, buffers, wal, walfull, cpu_new)
    v5 = cat(alloy_elapsed, pages, scanned, "','", alloy_mintxid, tuples,
             oldxmin, "','", alloy_maxdead, buffers, rates, cpu_new,
             alloy_prefetch)

    cases = "".join(
        f" WHEN {i} THEN {v}" for i, v in enumerate([v0, v1, v2, v3, v4, v5])
    )
    # variant selector must be independent of the rule-assignment modulus
    # (event_id % len(RULES)): gcd(111, 6) = 3 would leave four variants
    # never rendered — user_id is uncorrelated with the rule index
    return f"{head} || CASE CAST(user_id % 6 AS INT){cases} END"


RULES: list[Rule] = [
    # --- statement / cancellation (analyze.go:37,46,1087) ------------------
    # auto_explain precedes plain duration (analyze.go orders the same way);
    # its regex requires the 'plan:' marker so the two cannot cross-match
    Rule(
        "duration: ",
        r"^duration: ([0-9.]+) ms +plan:",
        "STATEMENT_AUTO_EXPLAIN",
        "LOG",
        f"'duration: ' || {_MS} || ' ms  plan: '"
        " || '{\"Query Text\": \"SELECT * FROM orders WHERE o_custkey = '"
        f" || {_UID} || '\", \"Plan\": {{\"Node Type\": \"Seq Scan\","
        f" \"Filter\": \"(o_custkey = ' || {_UID} || ')\"}}}}'",
        num_group=1,
    ),
    Rule(
        "duration: ",
        # bare 'duration: N ms' (log_duration without log_statement) is the
        # same class (analyze_test.go:..; proto comment "duration: ")
        r"^duration: ([0-9.]+) ms(?: +(statement|execute [^:]*): (.*)|\s*$)",
        "STATEMENT_DURATION",
        "LOG",
        f"'duration: ' || {_MS} || ' ms'"
        " || CASE WHEN event_id % 5 = 0 THEN ''"
        f" ELSE '  statement: SELECT * FROM events WHERE user_id = ' || {_UID} END",
        num_group=1,
        text_group=3,
    ),
    Rule(
        "canceling statement due to statement timeout",
        r"^canceling statement due to statement timeout",
        "STATEMENT_CANCELED_TIMEOUT",
        "ERROR",
        "'canceling statement due to statement timeout'",
    ),
    Rule(
        "canceling statement due to user request",
        r"^canceling statement due to user request",
        "STATEMENT_CANCELED_USER",
        "ERROR",
        "'canceling statement due to user request'",
    ),
    # --- autovacuum family (analyze.go:65-125) -----------------------------
    Rule(
        "automatic ",
        r'^automatic (?:aggressive )?vacuum (?:to prevent wraparound )?of table "([^"]+)": index scans: ([0-9]+)',
        "AUTOVACUUM_COMPLETED",
        "LOG",
        # completion body cycling six PG-version shapes (analyze.go:81-108);
        # the PG14-subset extractor (classify.autovacuum_details) parses the
        # v0 shape, the full-vector extractor (autovacuum_full_details)
        # resolves every version-dependent clause across all six
        _autovacuum_sample(),
        num_group=2,
        text_group=1,
    ),
    # full reference regex (analyze.go:111-122): optional PG14+ I/O-timing /
    # read-rate / buffer-usage clauses, then either the legacy
    # 'CPU 0.01s/0.02u sec elapsed 0.05 sec' or the PG14+
    # 'CPU: user: … s, system: … s, elapsed: … s' rusage shape — the
    # fixture cycles all combinations
    Rule(
        "automatic analyze of table",
        r'^automatic analyze of table "(.+?)"\s*'
        r"(?:I/O timings: read: ([\d.]+) ms, write: ([\d.]+) ms)?\s*"
        r"(?:avg read rate: ([\d.]+) MB/s, avg write rate: ([\d.]+) MB/s)?\s*"
        r"(?:buffer usage: (\d+) hits, (\d+) (?:misses|reads), (\d+) dirtied)?\s*"
        r"system usage: CPU(?:(?: ([\d.]+)s/([\d.]+)u sec elapsed ([\d.]+) sec)"
        r"|(?:: user: ([\d.]+) s, system: ([\d.]+) s, elapsed: ([\d.]+) s))",
        "AUTOANALYZE_COMPLETED",
        "LOG",
        f"'automatic analyze of table \"db_' || {_DB} || '.public.rel_' || {_EID} || '\" '"
        " || CASE WHEN event_id % 3 = 0 THEN"
        "   'I/O timings: read: ' || CAST(event_id % 40 AS STRING) || '.25 ms,"
        " write: ' || CAST(event_id % 9 AS STRING) || '.5 ms"
        " avg read rate: ' || CAST(event_id % 80 AS STRING) || '.125 MB/s,"
        " avg write rate: ' || CAST(event_id % 20 AS STRING) || '.75 MB/s"
        " buffer usage: ' || CAST(event_id % 4000 AS STRING) || ' hits, '"
        " || CAST(event_id % 300 AS STRING) || ' misses, '"
        " || CAST(event_id % 200 AS STRING) || ' dirtied '"
        " ELSE '' END"
        " || 'system usage: CPU' || CASE WHEN event_id % 2 = 0"
        " THEN ': user: 0.' || CAST(10 + event_id % 80 AS STRING)"
        "   || ' s, system: 0.0' || CAST(1 + event_id % 9 AS STRING)"
        "   || ' s, elapsed: 1.' || CAST(10 + event_id % 90 AS STRING) || ' s'"
        " ELSE ' 0.0' || CAST(1 + event_id % 9 AS STRING)"
        "   || 's/0.' || CAST(10 + event_id % 80 AS STRING)"
        "   || 'u sec elapsed 1.' || CAST(10 + event_id % 90 AS STRING) || ' sec'"
        " END",
        text_group=1,
    ),
    Rule(
        "skipping vacuum of",
        r'^skipping vacuum of "([^"]+)" --- lock not available',
        "SKIPPING_VACUUM_LOCK_NOT_AVAILABLE",
        "LOG",
        f"'skipping vacuum of \"rel_' || {_EID} || '\" --- lock not available'",
        text_group=1,
    ),
    Rule(
        "skipping analyze of",
        r'^skipping analyze of "([^"]+)" --- lock not available',
        "SKIPPING_ANALYZE_LOCK_NOT_AVAILABLE",
        "LOG",
        f"'skipping analyze of \"rel_' || {_EID} || '\" --- lock not available'",
        text_group=1,
    ),
    # --- checkpoint family (analyze.go:126-162) ----------------------------
    Rule(
        "checkpoint starting: ",
        r"^checkpoint starting: ([a-z- ]+)",
        "CHECKPOINT_STARTING",
        "LOG",
        "'checkpoint starting: time'",
        text_group=1,
    ),
    Rule(
        "restartpoint starting: ",
        r"^restartpoint starting: ([a-z- ]+)",
        "RESTARTPOINT_STARTING",
        "LOG",
        "'restartpoint starting: shutdown immediate'",
        text_group=1,
    ),
    Rule(
        "checkpoint complete",
        r"^(checkpoint|restartpoint) complete: wrote ([0-9]+) buffers \(([0-9.]+)%\)",
        "CHECKPOINT_COMPLETE",
        "LOG",
        "'checkpoint'"
        f" || ' complete: wrote ' || {_N} || ' buffers ('"
        " || CAST(CAST(event_id % 100 AS DECIMAL(5,1)) AS STRING) || '%)'"
        " || CASE WHEN event_id % 3 = 0 THEN ', wrote '"
        "      || CAST(event_id % 50 AS STRING) || ' SLRU buffers' ELSE '' END"
        " || '; ' || CAST(event_id % 9 AS STRING)"
        " || CASE WHEN event_id % 5 = 0 THEN ' transaction log file(s) added, '"
        "         ELSE ' WAL file(s) added, ' END"
        " || CAST(event_id % 7 AS STRING) || ' removed, '"
        " || CAST(event_id % 11 AS STRING) || ' recycled'"
        " || '; write=' || CAST(event_id % 300 AS STRING) || '.'"
        " || CAST(event_id % 10 AS STRING) || ' s'"
        " || ', sync=' || CAST(event_id % 30 AS STRING) || '.0 s'"
        " || ', total=' || CAST(event_id % 310 AS STRING) || '.5 s'"
        " || '; sync files=' || CAST(event_id % 120 AS STRING)"
        " || ', longest=' || CAST(event_id % 3 AS STRING) || '.2 s'"
        " || ', average=0.' || CAST(event_id % 10 AS STRING) || ' s'"
        " || '; distance=' || CAST(event_id % 90000 AS STRING) || ' kB'"
        " || ', estimate=' || CAST(event_id % 95000 AS STRING) || ' kB'"
        " || CASE WHEN event_id % 4 = 0 THEN '; lsn=1/'"
        "      || CAST(event_id % 100000 AS STRING) || ', redo lsn=1/'"
        "      || CAST((event_id * 7) % 100000 AS STRING) ELSE '' END",
        num_group=2,
    ),
    Rule(
        "restartpoint complete",
        r"^(checkpoint|restartpoint) complete: wrote ([0-9]+) buffers \(([0-9.]+)%\)",
        "RESTARTPOINT_COMPLETE",
        "LOG",
        "'restartpoint'"
        f" || ' complete: wrote ' || {_N} || ' buffers ('"
        " || CAST(CAST(event_id % 100 AS DECIMAL(5,1)) AS STRING) || '%)'"
        " || CASE WHEN event_id % 3 = 0 THEN ', wrote '"
        "      || CAST(event_id % 50 AS STRING) || ' SLRU buffers' ELSE '' END"
        " || '; ' || CAST(event_id % 9 AS STRING)"
        " || CASE WHEN event_id % 5 = 0 THEN ' transaction log file(s) added, '"
        "         ELSE ' WAL file(s) added, ' END"
        " || CAST(event_id % 7 AS STRING) || ' removed, '"
        " || CAST(event_id % 11 AS STRING) || ' recycled'"
        " || '; write=' || CAST(event_id % 300 AS STRING) || '.'"
        " || CAST(event_id % 10 AS STRING) || ' s'"
        " || ', sync=' || CAST(event_id % 30 AS STRING) || '.0 s'"
        " || ', total=' || CAST(event_id % 310 AS STRING) || '.5 s'"
        " || '; sync files=' || CAST(event_id % 120 AS STRING)"
        " || ', longest=' || CAST(event_id % 3 AS STRING) || '.2 s'"
        " || ', average=0.' || CAST(event_id % 10 AS STRING) || ' s'"
        " || '; distance=' || CAST(event_id % 90000 AS STRING) || ' kB'"
        " || ', estimate=' || CAST(event_id % 95000 AS STRING) || ' kB'"
        " || CASE WHEN event_id % 4 = 0 THEN '; lsn=1/'"
        "      || CAST(event_id % 100000 AS STRING) || ', redo lsn=1/'"
        "      || CAST((event_id * 7) % 100000 AS STRING) ELSE '' END",
        num_group=2,
    ),
    Rule(
        "checkpoints are occurring too frequently",
        r"^checkpoints are occurring too frequently \(([0-9]+) seconds? apart\)",
        "CHECKPOINT_TOO_FREQUENT",
        "WARNING",
        "'checkpoints are occurring too frequently ('"
        " || CAST(5 + event_id % 25 AS STRING) || ' seconds apart)'",
        num_group=1,
    ),
    Rule(
        "recovery restart point at",
        r"^recovery restart point at ([0-9A-F]+)/([0-9A-F]+)",
        "RESTARTPOINT_AT",
        "LOG",
        f"'recovery restart point at 1F/' || {_N}",
        text_group=2,
    ),
    # --- connection family (analyze.go:170-307) ----------------------------
    Rule(
        "connection received: ",
        r"^connection received: host=([^ ]+)( port=[0-9]+)?",
        "CONNECTION_RECEIVED",
        "LOG",
        f"'connection received: host=10.0.0.' || {_HOST} || ' port='"
        " || CAST(40000 + event_id % 10000 AS STRING)",
        text_group=1,
    ),
    Rule(
        "connection authorized: ",
        r"^connection authorized: user=[0-9A-Za-z_]+( database=[0-9A-Za-z_]+)?",
        "CONNECTION_AUTHORIZED",
        "LOG",
        f"'connection authorized: user=u' || {_UID} || ' database=db_' || {_DB}"
        " || CASE WHEN event_id % 3 = 0 THEN ' SSL enabled (protocol=TLSv1.'"
        " || CAST(2 + event_id % 2 AS STRING)"
        " || ', cipher=ECDHE-RSA-AES256-GCM-SHA384, compression=off)'"
        " ELSE '' END",
    ),
    Rule(
        "connection authenticated: ",
        r'^connection authenticated: (?:user|identity)="[0-9A-Za-z_]+" method=[0-9A-Za-z_]+ \([0-9A-Za-z_]+:[0-9]+\)',
        "CONNECTION_AUTHENTICATED",
        "LOG",
        f"'connection authenticated: identity=\"u' || {_UID}"
        " || '\" method=md5 (auth:' || CAST(1 + event_id % 90 AS STRING) || ')'",
    ),
    Rule(
        "no pg_hba.conf entry for host",
        r'^no pg_hba.conf entry for host "[^"]+", user "[^"]+", database "[^"]+"',
        "CONNECTION_REJECTED",
        "FATAL",
        f"'no pg_hba.conf entry for host \"10.0.0.' || {_HOST}"
        f" || '\", user \"u' || {_UID} || '\", database \"db_' || {_DB} || '\"'",
    ),
    Rule(
        "Ident authentication failed for user",
        r'^Ident authentication failed for user "([^"]+)"',
        "CONNECTION_REJECTED",
        "FATAL",
        f"'Ident authentication failed for user \"u' || {_UID} || '\"'",
        text_group=1,
    ),
    Rule(
        "role \"",
        r'^role "([^"]+)" is not permitted to log in',
        "CONNECTION_REJECTED",
        "FATAL",
        f"'role \"u' || {_UID} || '\" is not permitted to log in'",
        text_group=1,
    ),
    Rule(
        "database \"",
        r'^database "([^"]+)" is not currently accepting connections',
        "CONNECTION_REJECTED",
        "FATAL",
        f"'database \"db_' || {_DB} || '\" is not currently accepting connections'",
        text_group=1,
    ),
    Rule(
        "disconnection: ",
        r"^disconnection: session time: ([0-9]+):([0-9]+):([0-9.]+) user=[0-9A-Za-z_]+ database=[0-9A-Za-z_]+ host=[^ ]+",
        "CONNECTION_DISCONNECTED",
        "LOG",
        "'disconnection: session time: 0:' || CAST(event_id % 60 AS STRING)"
        f" || ':33.12 user=u' || {_UID} || ' database=db_' || {_DB}"
        f" || ' host=10.0.0.' || {_HOST}",
        num_group=2,
    ),
    Rule(
        (
            "could not receive data from client",
            "could not send data to client",
            "connection to client lost",
            "terminating connection because protocol synchronization was lost",
            "unexpected EOF on client connection",
        ),
        r"^(?:could not (?:receive data from|send data to) client: [0-9A-Za-z ]+"
        r"|connection to client lost"
        r"|terminating connection because protocol synchronization was lost"
        r"|unexpected EOF on client connection$)",
        "CONNECTION_LOST",
        "LOG",
        "CASE CAST(event_id % 5 AS INT)"
        " WHEN 0 THEN 'could not receive data from client: Connection reset by peer'"
        " WHEN 1 THEN 'could not send data to client: Broken pipe'"
        " WHEN 2 THEN 'connection to client lost'"
        " WHEN 3 THEN 'terminating connection because protocol synchronization was lost'"
        " ELSE 'unexpected EOF on client connection' END",
    ),
    Rule(
        "too many connections for role",
        r'^too many connections for role "([^"]+)"',
        "TOO_MANY_CONNECTIONS_ROLE",
        "FATAL",
        f"'too many connections for role \"u' || {_UID} || '\"'",
        text_group=1,
    ),
    Rule(
        "too many connections for database",
        r'^too many connections for database "([^"]+)"',
        "TOO_MANY_CONNECTIONS_DATABASE",
        "FATAL",
        f"'too many connections for database \"db_' || {_DB} || '\"'",
        text_group=1,
    ),
    Rule(
        "could not accept SSL connection",
        r"^could not accept SSL connection: [0-9A-Za-z ]+",
        "COULD_NOT_ACCEPT_SSL_CONNECTION",
        "LOG",
        "'could not accept SSL connection: EOF detected'",
    ),
    Rule(
        "unsupported frontend protocol",
        r"^unsupported frontend protocol [0-9]+\.[0-9]+: server supports [0-9]+\.[0-9]+ to [0-9]+\.[0-9]+",
        "PROTOCOL_ERROR_UNSUPPORTED_VERSION",
        "FATAL",
        "'unsupported frontend protocol 3.' || CAST(2 + event_id % 7 AS STRING)"
        " || ': server supports 1.0 to 3.0'",
    ),
    # --- lock / deadlock family (analyze.go:370-393) -----------------------
    Rule(
        "process ",
        r"^process [0-9]+ acquired ([0-9A-Za-z]+Lock) on ([0-9A-Za-z]+)(?: .+?)? after ([0-9.]+) ms",
        "LOCK_ACQUIRED",
        "LOG",
        f"'process ' || CAST(1000 + user_id % 200 AS STRING)"
        f" || ' acquired ShareLock on transaction ' || {_N}"
        f" || ' after ' || {_MS} || ' ms'",
        num_group=3,
        text_group=1,
    ),
    Rule(
        "process ",
        r"^process [0-9]+ still waiting for ([0-9A-Za-z]+) on ([0-9A-Za-z]+) (?:.+?) after ([0-9.]+) ms",
        "LOCK_WAITING",
        "LOG",
        # lock-on shapes cycle the reference's variety (analyze.go:377):
        # plain transaction, virtual transaction, advisory lock brackets,
        # relation-of-database — the extractor's remap and arbitrary-middle
        # tolerance both get exercised
        f"'process ' || CAST(1000 + user_id % 200 AS STRING)"
        " || ' still waiting for ShareLock on '"
        " || CASE CAST(user_id % 4 AS INT)"
        f"   WHEN 0 THEN 'transaction ' || {_N}"
        f"   WHEN 1 THEN 'virtual transaction 2/' || {_N}"
        f"   WHEN 2 THEN 'advisory lock [' || {_N} || ',1,2,2]'"
        f"   ELSE 'relation ' || {_N} || ' of database 16384' END"
        f" || ' after ' || {_MS} || ' ms'",
        num_group=3,
        text_group=1,
    ),
    # avoided/detected deadlock are their own classes in the reference
    # (analyze.go:1476-1480)
    Rule(
        "process ",
        r"^process [0-9]+ avoided deadlock for ([0-9A-Za-z]+) on ([0-9A-Za-z]+) (?:.+?) after ([0-9.]+) ms",
        "LOCK_DEADLOCK_AVOIDED",
        "LOG",
        f"'process ' || CAST(1000 + user_id % 200 AS STRING)"
        f" || ' avoided deadlock for ShareLock on transaction ' || {_N}"
        " || ' by rearranging queue order'"
        f" || ' after ' || {_MS} || ' ms'",
        num_group=3,
        text_group=1,
    ),
    Rule(
        "process ",
        r"^process [0-9]+ detected deadlock while waiting for ([0-9A-Za-z]+) on ([0-9A-Za-z]+) (?:.+?) after ([0-9.]+) ms",
        "LOCK_DEADLOCK_DETECTED",
        "LOG",
        f"'process ' || CAST(1000 + user_id % 200 AS STRING)"
        f" || ' detected deadlock while waiting for ShareLock on transaction ' || {_N}"
        f" || ' after ' || {_MS} || ' ms'",
        num_group=3,
        text_group=1,
    ),
    Rule(
        "deadlock detected",
        r"^deadlock detected",
        "LOCK_DEADLOCK_DETECTED",
        "ERROR",
        "'deadlock detected'",
    ),
    # --- wraparound family (analyze.go:410-423) ----------------------------
    # full reference alternation (analyze.go:406-412): databases referenced
    # by OID render 'with OID n', known ones the quoted name; the fixture
    # cycles both variants so the OID branch is exercised
    Rule(
        "database ",
        r'^database (with OID ([0-9]+)|"([^"]+)") must be vacuumed within ([0-9]+) transactions',
        "TXID_WRAPAROUND_WARNING",
        "WARNING",
        "'database ' || CASE WHEN event_id % 3 = 0"
        f" THEN 'with OID ' || CAST(16000 + user_id % 5 AS STRING)"
        f" ELSE '\"db_' || {_DB} || '\"' END"
        " || ' must be vacuumed within '"
        " || CAST(1000000 + event_id AS STRING) || ' transactions'",
        num_group=4,
        text_group=3,
    ),
    Rule(
        "database is not accepting commands to avoid wraparound data loss",
        r'^database is not accepting commands to avoid wraparound data loss in database (with OID ([0-9]+)|"([^"]+)")',
        "TXID_WRAPAROUND_ERROR",
        "ERROR",
        "'database is not accepting commands to avoid wraparound data loss"
        " in database ' || CASE WHEN event_id % 3 = 0"
        f" THEN 'with OID ' || CAST(16000 + user_id % 5 AS STRING)"
        f" ELSE '\"db_' || {_DB} || '\"' END",
        num_group=2,
        text_group=3,
    ),
    # --- server lifecycle / crash family (analyze.go:446-521) --------------
    Rule(
        "server process (PID ",
        r"^server process \(PID ([0-9]+)\) was terminated by signal (6|11)",
        "SERVER_CRASHED",
        "LOG",
        "'server process (PID ' || CAST(1000 + user_id % 200 AS STRING)"
        " || ') was terminated by signal 11'",
        num_group=1,
    ),
    Rule(
        "server process (PID ",
        r"^server process \(PID ([0-9]+)\) was terminated by signal (9)",
        "SERVER_OUT_OF_MEMORY",
        "LOG",
        "'server process (PID ' || CAST(1000 + user_id % 200 AS STRING)"
        " || ') was terminated by signal 9'",
        num_group=1,
    ),
    Rule(
        (
            "database system was shut down",
            "redirecting log output to logging collector process",
        ),
        r"^(?:database system was shut down(?: in recovery)? at [0-9-]+ [0-9:]+ [A-Z]+"
        r"|redirecting log output to logging collector process)",
        "SERVER_START",
        "LOG",
        "CASE WHEN event_id % 2 = 0"
        " THEN 'database system was shut down at 2024-01-05 10:00:00 UTC'"
        " ELSE 'redirecting log output to logging collector process' END",
    ),
    Rule(
        (
            "database system was not properly shut down; automatic recovery in progress",
            "database system was interrupted",
        ),
        r"^(?:database system was not properly shut down; automatic recovery in progress"
        r"|database system was interrupted; last known up at .+)",
        "SERVER_START_RECOVERING",
        "LOG",
        "CASE WHEN event_id % 2 = 0"
        " THEN 'database system was not properly shut down; automatic recovery in progress'"
        " ELSE 'database system was interrupted; last known up at 2024-01-05 09:33:02 UTC' END",
    ),
    # --- temp files (analyze.go:535) ---------------------------------------
    Rule(
        "temporary file: path ",
        r'^temporary file: path "([^"]+)", size ([0-9]+)',
        "SERVER_TEMP_FILE_CREATED",
        "LOG",
        "'temporary file: path \"base/pgsql_tmp/pgsql_tmp' || "
        f"{_N} || '.0\", size ' || CAST(event_id * 8192 AS STRING)",
        num_group=2,
        text_group=1,
    ),
    # --- WAL / archiver family (analyze.go:321-357,639-669) ----------------
    # full reference alternation (analyze.go:341-352): exit-code and
    # signal terminations (signal rows may carry a ': Name' suffix); the
    # fixture cycles all three shapes
    Rule(
        "archive command ",
        r"^archive command (?:failed with exit code ([0-9]+)|was terminated by signal ([0-9]+)(: [\w ]+)?)",
        "WAL_ARCHIVE_COMMAND_FAILED",
        "LOG",
        "'archive command ' || CASE WHEN event_id % 3 = 0"
        " THEN 'was terminated by signal ' || CAST(6 + event_id % 10 AS STRING)"
        "   || CASE WHEN event_id % 6 = 0 THEN ': Killed' ELSE '' END"
        " ELSE 'failed with exit code ' || CAST(1 + event_id % 3 AS STRING) END",
        num_group=1,
    ),
    Rule(
        "invalid record length at",
        r"^invalid record length at ([0-9A-F]+)/([0-9A-F]+)",
        "WAL_INVALID_RECORD_LENGTH",
        "LOG",
        f"'invalid record length at 1F/' || {_N}",
        text_group=2,
    ),
    Rule(
        "redo ",
        r"^redo (?:(?:starts|done) at ([0-9A-F]+)/([0-9A-F]+)|is not required)",
        "WAL_REDO",
        "LOG",
        f"'redo starts at 0/' || {_N}",
        text_group=2,
    ),
    Rule(
        ("started streaming WAL from primary", "restarted WAL streaming"),
        r"^(?:started streaming WAL from primary|restarted WAL streaming) at ([0-9A-F]+)/([0-9A-F]+) on timeline ([0-9]+)",
        "STANDBY_STARTED_STREAMING",
        "LOG",
        "CASE WHEN event_id % 2 = 0 THEN 'started streaming WAL from primary'"
        f" ELSE 'restarted WAL streaming' END || ' at 1A/' || {_N}"
        " || ' on timeline ' || CAST(1 + event_id % 4 AS STRING)",
        num_group=3,
        text_group=2,
    ),
    Rule(
        "restored log file ",
        r'^restored log file "([^"]+)" from archive',
        "STANDBY_RESTORED_WAL_FROM_ARCHIVE",
        "LOG",
        f"'restored log file \"00000001000000010000' || {_HOST} || '\" from archive'",
        text_group=1,
    ),
    Rule(
        "consistent recovery state reached at",
        r"^consistent recovery state reached at ([0-9A-F]+)/([0-9A-F]+)",
        "STANDBY_CONSISTENT_RECOVERY_STATE",
        "LOG",
        f"'consistent recovery state reached at 2B/' || {_N}",
        text_group=2,
    ),
    # --- constraint violations (analyze.go:694-787) ------------------------
    Rule(
        "duplicate key value violates unique constraint",
        r'^duplicate key value violates unique constraint "([^"]+)"',
        "UNIQUE_CONSTRAINT_VIOLATION",
        "ERROR",
        f"'duplicate key value violates unique constraint \"uniq_' || {_EID} || '\"'",
        text_group=1,
    ),
    Rule(
        "insert or update on table ",
        r'^insert or update on table "([^"]+)" violates foreign key constraint "([^"]+)"',
        "FOREIGN_KEY_CONSTRAINT_VIOLATION",
        "ERROR",
        f"'insert or update on table \"rel_' || {_EID}"
        f" || '\" violates foreign key constraint \"fk_' || {_EID} || '\"'",
        text_group=1,
    ),
    Rule(
        "null value in column ",
        r'^null value in column "([^"]+)" violates not-null constraint',
        "NOT_NULL_CONSTRAINT_VIOLATION",
        "ERROR",
        f"'null value in column \"col_' || CAST(event_id % 20 AS STRING)"
        " || '\" violates not-null constraint'",
        text_group=1,
    ),
    Rule(
        "new row for relation ",
        r'^new row for relation "([^"]+)" violates check constraint "([^"]+)"',
        "CHECK_CONSTRAINT_VIOLATION",
        "ERROR",
        f"'new row for relation \"rel_' || {_EID}"
        f" || '\" violates check constraint \"chk_' || {_EID} || '\"'",
        text_group=1,
    ),
    # --- statement errors (analyze.go:795-966) -----------------------------
    Rule(
        "syntax error at ",
        r'^syntax error at (?:end of input|or near "(.+)")(?: at character [0-9]+)?',
        "SYNTAX_ERROR",
        "ERROR",
        "'syntax error at or near \"FORM\" at character '"
        " || CAST(1 + event_id % 80 AS STRING)",
        text_group=1,
    ),
    Rule(
        "column ",
        r'^column "?[^" ]+"? does not exist(?: at character [0-9]+)?',
        "COLUMN_DOES_NOT_EXIST",
        "ERROR",
        "'column \"col_' || CAST(event_id % 20 AS STRING)"
        " || '\" does not exist at character ' || CAST(1 + event_id % 40 AS STRING)",
    ),
    Rule(
        "relation \"",
        r'^relation "([^"]+)" does not exist(?: at character [0-9]+)?',
        "RELATION_DOES_NOT_EXIST",
        "ERROR",
        f"'relation \"missing_' || {_EID} || '\" does not exist at character '"
        " || CAST(1 + event_id % 30 AS STRING)",
        text_group=1,
    ),
    Rule(
        "permission denied for ",
        r"^permission denied for (?:column|relation|table|sequence|database|function|schema) ([0-9A-Za-z_-]+)",
        "PERMISSION_DENIED",
        "ERROR",
        f"'permission denied for table rel_' || {_EID}",
        text_group=1,
    ),
    # --- config / workers (analyze.go:602-622) -----------------------------
    Rule(
        "parameter \"",
        r'^parameter "([^"]+)" (?:changed to "([^"]+)"|cannot be changed without restarting the server)',
        "SERVER_RELOAD",
        "LOG",
        "'parameter \"work_mem\" changed to \"' || CAST(64 + event_id % 192 AS STRING) || 'MB\"'",
        text_group=1,
    ),
    # fixture cycles process type (parallel worker vs named background
    # worker) and termination shape (exit code vs signal) so the detail
    # extractor's parallel-worker parent-pid remap (analyze.go:2005-2013)
    # and both alternates are exercised
    Rule(
        "worker process: ",
        r"^worker process: (.+?) \(PID ([0-9]+)\) (?:exited with exit code ([0-9]+)|was terminated by signal ([0-9]+))",
        "SERVER_PROCESS_EXITED",
        "LOG",
        "'worker process: ' || CASE WHEN event_id % 3 = 0"
        " THEN 'logical replication launcher'"
        " ELSE 'parallel worker for PID ' || CAST(1000 + user_id % 200 AS STRING) END"
        " || ' (PID ' || CAST(2000 + event_id % 500 AS STRING) || ') '"
        " || CASE WHEN event_id % 2 = 0 THEN 'exited with exit code 1'"
        " ELSE 'was terminated by signal 9' END",
        num_group=2,
        text_group=1,
    ),
    # --- recovery / WAL continued (analyze.go:162,337,357,543-686) ---------
    Rule(
        "last completed transaction was at log time",
        r"^last completed transaction was at log time ([0-9-]+ [0-9:.]+[0-9:+-]*)",
        "WAL_REDO",
        "LOG",
        "'last completed transaction was at log time 2024-01-0'"
        " || CAST(1 + event_id % 9 AS STRING) || ' 10:22:33.456+00'",
        text_group=1,
    ),
    Rule(
        "archiver process (PID ",
        r"^archiver process \(PID ([0-9]+)\) exited with exit code ([0-9]+)",
        "WAL_ARCHIVE_COMMAND_FAILED",
        "LOG",
        "'archiver process (PID ' || CAST(3000 + event_id % 400 AS STRING)"
        " || ') exited with exit code 1'",
        num_group=1,
    ),
    Rule(
        "could not open usermap file ",
        r'^could not open usermap file "([^"]+)": (.+)',
        "SERVER_MISC",
        "LOG",
        "'could not open usermap file \"/etc/pg_ident.conf\": No such file or directory'",
        text_group=1,
    ),
    Rule(
        "could not link file ",
        r'^could not link file "([^"]+)" to "([^"]+)": (.+)',
        "SERVER_MISC",
        "LOG",
        f"'could not link file \"pg_wal/xlogtemp.' || {_N}"
        " || '\" to \"pg_wal/00000001\": File exists'",
        text_group=1,
    ),
    Rule(
        "unexpected pageaddr ",
        r"^unexpected pageaddr [0-9A-F]+/[0-9A-Z]+ in log segment [0-9A-Za-z]+, offset [0-9]+",
        "SERVER_MISC",
        "LOG",
        f"'unexpected pageaddr 1F/' || {_N} || ' in log segment 000000010000'"
        " || CAST(event_id % 90 AS STRING) || ', offset ' || CAST(event_id % 8192 AS STRING)",
    ),
    Rule(
        "could not receive data from WAL stream",
        r"^could not receive data from WAL stream: ([0-9A-Za-z: ]+)",
        "STANDBY_STREAMING_INTERRUPTED",
        "LOG",
        "'could not receive data from WAL stream: server closed the connection unexpectedly'",
        text_group=1,
    ),
    Rule(
        "according to history file",
        r"^according to history file, WAL location .+? belongs to timeline [0-9]+, but previous recovered WAL file came from timeline [0-9]+",
        "STANDBY_INVALID_TIMELINE",
        "FATAL",
        f"'according to history file, WAL location 2B/' || {_N}"
        " || ' belongs to timeline 2, but previous recovered WAL file came from timeline 1'",
    ),
    # --- storage corruption (analyze.go:586-594) ---------------------------
    Rule(
        "page verification failed",
        r"^page verification failed, calculated checksum ([0-9]+) but expected ([0-9]+)",
        "SERVER_INVALID_CHECKSUM",
        "WARNING",
        f"'page verification failed, calculated checksum ' || {_N}"
        " || ' but expected ' || CAST(event_id % 65536 AS STRING)",
        num_group=1,
    ),
    Rule(
        "invalid page in block",
        r"^invalid page in block ([0-9]+) of relation ([0-9A-Za-z/]+)",
        "SERVER_INVALID_CHECKSUM",
        "ERROR",
        f"'invalid page in block ' || {_N} || ' of relation base/16384/' || {_EID}",
        num_group=1,
        text_group=2,
    ),
    # --- config continued (analyze.go:610) ---------------------------------
    Rule(
        "configuration file ",
        r'^configuration file "([^"]+)" contains errors; unaffected changes were applied',
        "SERVER_RELOAD",
        "LOG",
        "'configuration file \"/etc/postgresql.conf\" contains errors; unaffected changes were applied'",
        text_group=1,
    ),
    # --- constraint violations continued (analyze.go:755-787) --------------
    Rule(
        "check constraint ",
        r'^check constraint "([^"]+)" is violated by some row',
        "CHECK_CONSTRAINT_VIOLATION",
        "ERROR",
        f"'check constraint \"chk_' || {_EID} || '\" is violated by some row'",
        text_group=1,
    ),
    Rule(
        "column \"",
        r'^column "([^"]+)" of table "([^"]+)" contains values that violate the new constraint',
        "CHECK_CONSTRAINT_VIOLATION",
        "ERROR",
        "'column \"col_' || CAST(event_id % 20 AS STRING)"
        f" || '\" of table \"rel_' || {_EID}"
        " || '\" contains values that violate the new constraint'",
        text_group=1,
    ),
    Rule(
        "value for domain ",
        r'^value for domain (.+?) violates check constraint "([^"]+)"',
        "CHECK_CONSTRAINT_VIOLATION",
        "ERROR",
        "'value for domain positive_int violates check constraint \"chk_dom_'"
        f" || {_EID} || '\"'",
        text_group=1,
    ),
    Rule(
        "conflicting key value violates exclusion constraint",
        r'^conflicting key value violates exclusion constraint "([^"]+)"',
        "EXCLUSION_CONSTRAINT_VIOLATION",
        "ERROR",
        f"'conflicting key value violates exclusion constraint \"excl_' || {_EID} || '\"'",
        text_group=1,
    ),
    # --- statement errors continued (analyze.go:803-1060) ------------------
    Rule(
        "column \"",
        r'^column "([^"]+)" must appear in the GROUP BY clause or be used in an aggregate function',
        "COLUMN_MISSING_FROM_GROUP_BY",
        "ERROR",
        "'column \"col_' || CAST(event_id % 20 AS STRING)"
        " || '\" must appear in the GROUP BY clause or be used in an aggregate function'",
        text_group=1,
    ),
    Rule(
        "column \"",
        r'^column "([^"]+)" of relation "([^"]+)" does not exist(?: at character [0-9]+)?',
        "COLUMN_DOES_NOT_EXIST",
        "ERROR",
        "'column \"col_' || CAST(event_id % 20 AS STRING)"
        f" || '\" of relation \"rel_' || {_EID}"
        " || '\" does not exist at character ' || CAST(1 + event_id % 25 AS STRING)",
        text_group=1,
    ),
    Rule(
        "column reference ",
        r'^column reference "([^"]+)" is ambiguous(?: at character [0-9]+)?',
        "COLUMN_REFERENCE_AMBIGUOUS",
        "ERROR",
        "'column reference \"col_' || CAST(event_id % 20 AS STRING)"
        " || '\" is ambiguous at character ' || CAST(1 + event_id % 60 AS STRING)",
        text_group=1,
    ),
    Rule(
        "function ",
        r"^function ([^\"]+) does not exist(?: at character [0-9]+)?",
        "FUNCTION_DOES_NOT_EXIST",
        "ERROR",
        f"'function fn_' || {_EID} || '(integer) does not exist at character '"
        " || CAST(1 + event_id % 12 AS STRING)",
        text_group=1,
    ),
    Rule(
        "invalid input syntax for ",
        r'^invalid input syntax for [0-9A-Za-z ]+(?:: "([^"]+)")?(?: at character [0-9]+)?',
        "INVALID_INPUT_SYNTAX",
        "ERROR",
        "'invalid input syntax for type integer: \"abc' || CAST(event_id % 30 AS STRING)"
        " || '\" at character ' || CAST(1 + event_id % 45 AS STRING)",
        text_group=1,
    ),
    Rule(
        "value too long for type ",
        r"^value too long for type ([0-9A-Za-z ()]+)",
        "VALUE_TOO_LONG_FOR_TYPE",
        "ERROR",
        "'value too long for type character varying(' || CAST(8 + event_id % 56 AS STRING) || ')'",
        text_group=1,
    ),
    Rule(
        "invalid value ",
        r'^invalid value "([^"]+)" for "([^"]+)"',
        "INVALID_VALUE",
        "ERROR",
        "'invalid value \"x' || CAST(event_id % 40 AS STRING) || '\" for \"YYYY\"'",
        text_group=1,
    ),
    Rule(
        "malformed array literal: ",
        r'^malformed array literal: "(.+)"(?: at character [0-9]+)?',
        "MALFORMED_ARRAY_LITERAL",
        "ERROR",
        "'malformed array literal: \"{bad' || CAST(event_id % 15 AS STRING)"
        " || '\" at character ' || CAST(1 + event_id % 20 AS STRING)",
        text_group=1,
    ),
    Rule(
        "subquery in FROM must have an alias",
        r"^subquery in FROM must have an alias(?: at character [0-9]+)?",
        "SUBQUERY_MISSING_ALIAS",
        "ERROR",
        "'subquery in FROM must have an alias at character ' || CAST(1 + event_id % 90 AS STRING)",
    ),
    Rule(
        "INSERT has more expressions than target columns",
        r"^INSERT has more expressions than target columns(?: at character [0-9]+)?",
        "INSERT_TARGET_COLUMN_MISMATCH",
        "ERROR",
        "'INSERT has more expressions than target columns at character '"
        " || CAST(1 + event_id % 70 AS STRING)",
    ),
    Rule(
        "operator does not exist: ",
        r"^operator does not exist: ([0-9A-Za-z]+) ([^ ]+) ([0-9A-Za-z]+)(?: at character [0-9]+)?",
        "OPERATOR_DOES_NOT_EXIST",
        "ERROR",
        "'operator does not exist: integer ~~ text at character '"
        " || CAST(1 + event_id % 35 AS STRING)",
        text_group=2,
    ),
    Rule(
        "cannot drop ",
        r"^cannot drop ([^\"]+) because other objects depend on it",
        "CANNOT_DROP",
        "ERROR",
        f"'cannot drop table rel_' || {_EID} || ' because other objects depend on it'",
        text_group=1,
    ),
    Rule(
        "there is no parameter $",
        r"^there is no parameter [$][0-9]+(?: at character [0-9]+)?",
        "PARAM_MISSING",
        "ERROR",
        "'there is no parameter $' || CAST(1 + event_id % 9 AS STRING)"
        " || ' at character ' || CAST(1 + event_id % 50 AS STRING)",
    ),
    Rule(
        "unterminated quoted string",
        r'^unterminated quoted string(?: at or near "(.+?)")?(?: at character [0-9]+)?',
        "UNTERMINATED_QUOTED_STRING",
        "ERROR",
        "'unterminated quoted string at or near \"''abc' || CAST(event_id % 25 AS STRING)"
        " || '\" at character ' || CAST(1 + event_id % 40 AS STRING)",
        text_group=1,
    ),
    Rule(
        "unterminated quoted identifier",
        r'^unterminated quoted identifier(?: at or near "(.+?)")?(?: at character [0-9]+)?',
        "UNTERMINATED_QUOTED_IDENTIFIER",
        "ERROR",
        "'unterminated quoted identifier at or near \"col' || CAST(event_id % 25 AS STRING)"
        " || '\" at character ' || CAST(1 + event_id % 40 AS STRING)",
        text_group=1,
    ),
    Rule(
        "invalid byte sequence for encoding ",
        r'^invalid byte sequence for encoding "([^"]+)": (.*)',
        "INVALID_BYTE_SEQUENCE",
        "ERROR",
        "'invalid byte sequence for encoding \"UTF8\": 0x' || CAST(80 + event_id % 20 AS STRING)",
        text_group=1,
    ),
    # --- autovacuum lifecycle (analyze.go:58,433,439) ----------------------
    Rule(
        "canceling autovacuum task",
        r"^canceling autovacuum task",
        "AUTOVACUUM_CANCEL",
        "ERROR",
        "'canceling autovacuum task'",
    ),
    Rule(
        "autovacuum launcher started",
        r"^autovacuum launcher started",
        "AUTOVACUUM_LAUNCHER_STARTED",
        "LOG",
        "'autovacuum launcher started'",
    ),
    Rule(
        (
            "autovacuum launcher shutting down",
            "terminating autovacuum process due to administrator command",
        ),
        r"^(?:autovacuum launcher shutting down"
        r"|terminating autovacuum process due to administrator command)",
        "AUTOVACUUM_LAUNCHER_SHUTTING_DOWN",
        "LOG",
        "CASE WHEN event_id % 2 = 0 THEN 'autovacuum launcher shutting down'"
        " ELSE 'terminating autovacuum process due to administrator command' END",
    ),
    # --- connection lifecycle continued (analyze.go:237-314) ---------------
    Rule(
        "incomplete startup packet",
        r"^incomplete startup packet",
        "CONNECTION_CLIENT_FAILED_TO_CONNECT",
        "LOG",
        "'incomplete startup packet'",
    ),
    Rule(
        "unexpected EOF on client connection with an open transaction",
        r"^unexpected EOF on client connection with an open transaction",
        "CONNECTION_LOST_OPEN_TX",
        "LOG",
        "'unexpected EOF on client connection with an open transaction'",
    ),
    Rule(
        "terminating connection due to administrator command",
        r"^terminating connection due to administrator command",
        "CONNECTION_TERMINATED",
        "FATAL",
        "'terminating connection due to administrator command'",
    ),
    Rule(
        "incomplete message from client",
        r"^incomplete message from client",
        "PROTOCOL_ERROR_INCOMPLETE_MESSAGE",
        "ERROR",
        "'incomplete message from client'",
    ),
    Rule(
        ("remaining connection slots are reserved", "sorry, too many clients already"),
        r"^(?:remaining connection slots are reserved|sorry, too many clients already)",
        "OUT_OF_CONNECTIONS",
        "FATAL",
        "CASE WHEN event_id % 2 = 0"
        " THEN 'remaining connection slots are reserved for non-replication superuser connections'"
        " ELSE 'sorry, too many clients already' END",
    ),
    # --- backup / locks / server lifecycle (analyze.go:364,403,445,566,629) -
    Rule(
        "pg_stop_backup complete",
        r"^pg_stop_backup complete, all required WAL segments have been archived",
        "WAL_BASE_BACKUP_COMPLETE",
        "LOG",
        "'pg_stop_backup complete, all required WAL segments have been archived'",
    ),
    Rule(
        "canceling statement due to lock timeout",
        r"^canceling statement due to lock timeout",
        "LOCK_TIMEOUT",
        "ERROR",
        "'canceling statement due to lock timeout'",
    ),
    Rule(
        "server process (PID ",
        r"^server process \(PID ([0-9]+)\) exited with exit code ([0-9]+)",
        "SERVER_PROCESS_EXITED",
        "LOG",
        "'server process (PID ' || CAST(1000 + user_id % 200 AS STRING)"
        " || ') exited with exit code ' || CAST(1 + event_id % 3 AS STRING)",
        num_group=1,
    ),
    Rule(
        "received SIGHUP, reloading configuration files",
        r"^received SIGHUP, reloading configuration files",
        "SERVER_RELOAD",
        "LOG",
        "'received SIGHUP, reloading configuration files'",
    ),
    Rule(
        (
            "using stale statistics instead of current ones",
            "pgstat wait timeout",
        ),
        r"^(?:using stale statistics instead of current ones because stats collector is not responding"
        r"|pgstat wait timeout$)",
        "SERVER_STATS_COLLECTOR_TIMEOUT",
        "WARNING",
        "CASE WHEN event_id % 2 = 0"
        " THEN 'using stale statistics instead of current ones because stats collector is not responding'"
        " ELSE 'pgstat wait timeout' END",
    ),
    # --- standby conflicts (analyze.go:662-679) ----------------------------
    Rule(
        "canceling statement due to conflict with recovery",
        r"^canceling statement due to conflict with recovery",
        "STANDBY_STATEMENT_CANCELED",
        "ERROR",
        "'canceling statement due to conflict with recovery'",
    ),
    Rule(
        "terminating walreceiver process due to administrator command",
        r"^terminating walreceiver process due to administrator command",
        "STANDBY_STOPPED_STREAMING",
        "FATAL",
        "'terminating walreceiver process due to administrator command'",
    ),
    # --- transaction / statement errors continued (analyze.go:717-1106) ----
    Rule(
        "update or delete on table ",
        r'^update or delete on table "([^"]+)" violates foreign key constraint "([^"]+)" on table "([^"]+)"',
        "FOREIGN_KEY_CONSTRAINT_VIOLATION",
        "ERROR",
        f"'update or delete on table \"rel_' || {_EID}"
        f" || '\" violates foreign key constraint \"fk_' || {_EID}"
        f" || '\" on table \"child_' || {_EID} || '\"'",
        text_group=1,
    ),
    Rule(
        "current transaction is aborted",
        r"^current transaction is aborted, commands ignored until end of transaction block",
        "TRANSACTION_IS_ABORTED",
        "ERROR",
        "'current transaction is aborted, commands ignored until end of transaction block'",
    ),
    Rule(
        "there is no unique or exclusion constraint matching the ON CONFLICT",
        r"^there is no unique or exclusion constraint matching the ON CONFLICT specification",
        "ON_CONFLICT_NO_CONSTRAINT_MATCH",
        "ERROR",
        "'there is no unique or exclusion constraint matching the ON CONFLICT specification'",
    ),
    Rule(
        "ON CONFLICT DO UPDATE command cannot affect row a second time",
        r"^ON CONFLICT DO UPDATE command cannot affect row a second time",
        "ON_CONFLICT_ROW_AFFECTED_TWICE",
        "ERROR",
        "'ON CONFLICT DO UPDATE command cannot affect row a second time'",
    ),
    Rule(
        "division by zero",
        r"^division by zero",
        "DIVISION_BY_ZERO",
        "ERROR",
        "'division by zero'",
    ),
    Rule(
        "integer out of range",
        r"^integer out of range",
        "INTEGER_OUT_OF_RANGE",
        "ERROR",
        "'integer out of range'",
    ),
    Rule(
        "invalid regular expression: ",
        r"^invalid regular expression: (.+)",
        "INVALID_REGEXP",
        "ERROR",
        "'invalid regular expression: parentheses () not balanced'",
        text_group=1,
    ),
    Rule(
        "no such savepoint",
        r"^no such savepoint",
        "NO_SUCH_SAVEPOINT",
        "ERROR",
        "'no such savepoint'",
    ),
    Rule(
        "column \"",
        r'^column "([^"]+)" cannot be cast to type "?([0-9A-Za-z ]+)"?',
        "COLUMN_CANNOT_BE_CAST",
        "ERROR",
        "'column \"col_' || CAST(event_id % 20 AS STRING)"
        " || '\" cannot be cast to type \"uuid\"'",
        text_group=1,
    ),
    Rule(
        "could not serialize access due to concurrent update",
        r"^could not serialize access due to concurrent update",
        "COULD_NOT_SERIALIZE_REPEATABLE_READ",
        "ERROR",
        "'could not serialize access due to concurrent update'",
    ),
    Rule(
        "could not serialize access due to read/write dependencies",
        r"^could not serialize access due to read/write dependencies among transactions",
        "COULD_NOT_SERIALIZE_SERIALIZABLE",
        "ERROR",
        "'could not serialize access due to read/write dependencies among transactions'",
    ),
    Rule(
        "range lower bound must be less than or equal to range upper bound",
        r"^range lower bound must be less than or equal to range upper bound",
        "INCONSISTENT_RANGE_BOUNDS",
        "ERROR",
        "'range lower bound must be less than or equal to range upper bound'",
    ),
    Rule(
        "op ANY/ALL (array) requires array on right side",
        r"^op ANY/ALL \(array\) requires array on right side(?: at character [0-9]+)?",
        "ANY_ALL_REQUIRES_ARRAY",
        "ERROR",
        "'op ANY/ALL (array) requires array on right side at character '"
        " || CAST(1 + event_id % 55 AS STRING)",
    ),
    # --- statement logging + collector marker (analyze.go:1112,1136) ------
    Rule(
        ("statement: ", "execute "),
        r"^(?:statement|(?:execute|execute fetch from) [^:]+): (.*)",
        "STATEMENT_LOG",
        "LOG",
        "CASE WHEN event_id % 2 = 0 THEN 'statement: '"
        f" ELSE 'execute stmt_' || {_EID} || ': ' END"
        f" || 'UPDATE events SET value = ' || {_MS}"
        f" || ' WHERE event_id = ' || {_EID}",
        text_group=1,
    ),
    Rule(
        "pganalyze-collector-identify: ",
        r"^pganalyze-collector-identify: (.*)",
        "PGA_COLLECTOR_IDENTIFY",
        "LOG",
        f"'pganalyze-collector-identify: server_' || {_DB}",
        text_group=1,
    ),
]


def rule_index(classification: str) -> int:
    """Position of the (unique-classification) rule in RULES — the fixture
    emits family ``i`` for events with event_id % len(RULES) == i, so
    secondary-line fixtures key off this to attach family-correct DETAIL
    rows (deadlock participants, lock queues)."""
    for i, r in enumerate(RULES):
        if r.classification == classification:
            return i
    raise KeyError(classification)


def sample_case(level_expr_prefix: str = "") -> str:
    """Render the primary-line content CASE over event_id % len(RULES).

    Each branch emits '<LEVEL>:  <sample body>' so every rule family appears
    in log_raw with deterministic frequency.

    Emitted as a COALESCE of ~16-branch sub-CASEs (each value matches
    exactly one chunk; the others return NULL) instead of one 115-branch
    CASE: Spark cannot split a single CASE expression across generated
    methods, and the monolithic form put the corpus-rendering stage over
    the JVM's 64 KB method limit — mostly a graceful interpreted fallback,
    but fatally so when the failure surfaced inside a broadcast-exchange
    thread in a long session. Values are identical in both dialects.
    """
    n = len(RULES)
    chunk = 16
    cases = []
    for lo in range(0, n, chunk):
        whens = "\n".join(
            f"    WHEN {i} THEN '{RULES[i].level}:  ' || ({RULES[i].sample})"
            for i in range(lo, min(lo + chunk, n))
        )
        cases.append(f"CASE CAST(event_id % {n} AS INT)\n{whens}\n  END")
    joined = ",\n  ".join(cases)
    return f"COALESCE(\n  {joined})"
