"""Table-driven goldens for the classification rule table — the reference's
test shape (logs/analyze_test.go): every rule's rendered sample line must
match its own prefix+regex, and first-match-wins scanning must select
exactly that rule. Pure DuckDB rendering + Python re; no Spark session."""

from __future__ import annotations

import re

import duckdb
import pytest

from collector_spark.logs.rules import RULES


@pytest.fixture(scope="module")
def rendered():
    con = duckdb.connect()
    out = {}
    for i, r in enumerate(RULES):
        sql = r.sample.replace("AS STRING", "AS VARCHAR")
        # enough (event_id, user_id) variety to cover every sample CASE
        # modulus in use (%2 %3 %4 %5 %6 %11)
        values = ", ".join(
            f"({e}, {u}, 67.89)" for e in range(120, 132) for u in (45, 46, 47)
        )
        body = con.execute(
            f"SELECT {sql} FROM (VALUES {values}) events(event_id, user_id, value)"
        ).fetchall()
        out[i] = [row[0] for row in body]
    con.close()
    return out


def test_every_sample_matches_its_rule(rendered):
    for i, r in enumerate(RULES):
        for body in rendered[i]:
            assert body.startswith(r.prefixes), (r.classification, body[:60])
            assert re.search(r.regex, body), (r.classification, body[:120])


def test_first_match_wins_selects_own_rule(rendered):
    for i, r in enumerate(RULES):
        for body in rendered[i]:
            for other in RULES:
                if body.startswith(other.prefixes) and re.search(other.regex, body):
                    assert other.classification == r.classification, (
                        f"{r.classification} sample classified as "
                        f"{other.classification}: {body[:120]}"
                    )
                    break
            else:
                pytest.fail(f"{r.classification}: no rule matched")


def test_multi_prefix_rules_cover_every_alternation(rendered):
    """Rules with a prefix list (reference attaches several literal prefixes,
    e.g. checkpoint/restartpoint) must render a sample under EACH prefix —
    otherwise an alternation is dead code the fixture can't catch."""
    multi = [(i, r) for i, r in enumerate(RULES) if len(r.prefixes) > 1]
    assert len(multi) >= 5  # checkpoint x2, client-comm, WAL-streaming, statement
    for i, r in enumerate(RULES):
        if len(r.prefixes) < 2:
            continue
        hit = {p for p in r.prefixes for body in rendered[i] if body.startswith(p)}
        assert hit == set(r.prefixes), (r.classification, hit)


def test_capture_groups_resolve(rendered):
    """Each declared capture group must resolve in at least one rendered
    variant (full-alternation rules — wraparound OID-vs-name, archiver
    exit-vs-signal — legitimately leave a group empty in the OTHER
    variant, so per-body emptiness is allowed)."""
    for i, r in enumerate(RULES):
        matches = [re.search(r.regex, body) for body in rendered[i]]
        if r.num_group:
            assert any(m.group(r.num_group) for m in matches), (
                r.classification,
                "num group empty in every variant",
            )
        if r.text_group:
            assert any(m.group(r.text_group) for m in matches), (
                r.classification,
                "text group empty in every variant",
            )


def _render_autovacuum(eids_uids):
    from collector_spark.logs.rules import _autovacuum_sample

    con = duckdb.connect()
    sql = _autovacuum_sample().replace("AS STRING", "AS VARCHAR")
    values = ", ".join(f"({e}, {u}, 1.5)" for e, u in eids_uids)
    rows = con.execute(
        f"SELECT {sql} FROM (VALUES {values}) events(event_id, user_id, value)"
    ).fetchall()
    con.close()
    return [r[0] for r in rows]


def test_autovacuum_full_regex_covers_every_variant():
    """Each of the six PG-version shapes must match the full 53-group regex,
    and every capture group must resolve in at least one variant — the
    version-dependent either-ors (scanned-vs-pinskipped, xmin-vs-cutoff,
    rates position, legacy-vs-modern rusage) all get exercised."""
    from collector_spark.logs.classify import _AV_FULL_NAMES, AUTOVACUUM_FULL_RE

    pat = re.compile(AUTOVACUUM_FULL_RE)
    assert pat.groups == len(_AV_FULL_NAMES)
    # event_ids chosen so aggressive (%11) and wraparound (%5) both flip;
    # user_id cycles the six variant shapes
    bodies = _render_autovacuum(
        [(e, u) for u in range(6) for e in (120, 121, 125, 132, 143)]
    )
    seen = set()
    for body in bodies:
        m = pat.search(body)
        assert m, body[:160]
        for gi in range(1, pat.groups + 1):
            if m.group(gi):
                seen.add(gi)
    missing = [
        _AV_FULL_NAMES[gi - 1] for gi in range(1, pat.groups + 1) if gi not in seen
    ]
    assert not missing, f"groups never resolved: {missing}"


def test_autovacuum_v0_still_matches_pg14_subset():
    """The u7b legacy-shape extractor must keep matching variant 0 (the
    original fixture shape) so its driver rows stay non-vacuous."""
    from collector_spark.logs.classify import AUTOVACUUM_DETAIL_RE

    for body in _render_autovacuum([(120, 0), (121, 6), (125, 12)]):
        assert re.search(AUTOVACUUM_DETAIL_RE, body), body[:160]


def test_autovacuum_variant_selector_independent_of_rule_modulus():
    """The variant CASE must key on user_id, not event_id: autovacuum lines
    all share event_id % len(RULES), and gcd(len(RULES), 6) > 1 would leave
    variants unreachable in the generated fixture."""
    # the trap: event_id ≡ rule_idx (mod len(RULES)), so any event_id-keyed
    # variant CASE silently loses variants whenever gcd(len(RULES), 6) > 1
    # (it was 3 when this bit); the selector must stay on user_id no matter
    # how the rule count drifts
    av = next(r for r in RULES if r.classification == "AUTOVACUUM_COMPLETED")
    assert "CASE CAST(user_id % 6 AS INT)" in av.sample
