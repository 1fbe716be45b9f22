"""Marker-based redaction (U8 faithful path) must agree with the codegen
regex path wherever the span sets coincide, and must produce well-formed,
non-overlapping spans."""

from __future__ import annotations


def test_marker_splice_agrees_with_regex_path(prepared_spark):
    from collector_spark.logs.redact import redact_secondaries_q, redact_with_markers

    regex_rows = {
        (r["pid"], r["secondary_seq"]): r["redacted_content"]
        for r in redact_secondaries_q(prepared_spark).collect()
    }
    marker_rows = redact_with_markers(prepared_spark).collect()
    assert len(marker_rows) == len(regex_rows)

    for r in marker_rows:
        # spans sorted and non-overlapping
        spans = [(m["byte_start"], m["byte_end"], m["kind"]) for m in r["markers"]]
        assert spans == sorted(spans)
        for a, b in zip(spans, spans[1:]):
            assert a[1] <= b[0]
        # where the only markers are quoted literals, splice == regex path;
        # credential markers outside quotes make the marker path strictly
        # more redacting, never less
        regex_out = regex_rows[(r["pid"], r["secondary_seq"])]
        if all(m["kind"] == "statement_text" for m in r["markers"]):
            assert r["redacted_content"] == regex_out
        assert r["redacted_content"].count("[redacted]") >= regex_out.count(
            "[redacted]"
        ) or not r["markers"]


def test_marker_splice_unit():
    from collector_spark.logs.redact import _mark_and_splice

    markers, out = _mark_and_splice(
        "SELECT balance FROM accounts WHERE token = 'tok_42'", True
    )
    # the quoted literal wins (earlier start); the nested tok_ span drops
    assert out == "SELECT balance FROM accounts WHERE token = [redacted]"
    assert [m["kind"] for m in markers] == ["statement_text"]

    markers, out = _mark_and_splice("auth tok_7 and name 'x'", True)
    assert out == "auth [redacted] and name [redacted]"
    assert [m["kind"] for m in markers] == ["credential", "statement_text"]

    markers, out = _mark_and_splice("nothing secret", True)
    assert (markers, out) == ([], "nothing secret")

    markers, out = _mark_and_splice("skip 'me'", False)
    assert (markers, out) == ([], "skip 'me'")


def test_marker_offsets_are_byte_offsets():
    """LogSecretMarker offsets are byte positions in the UTF-8 content
    (state/logs.go:121-127) — multi-byte characters before a span must
    advance the offsets by their encoded width, not by 1."""
    from collector_spark.logs.redact import _mark_and_splice

    content = "Benutzer 'Jürgen' größe tok_9"
    markers, out = _mark_and_splice(content, True)
    data = content.encode("utf-8")
    assert out == "Benutzer [redacted] größe [redacted]"
    assert [m["kind"] for m in markers] == ["statement_text", "credential"]
    for m in markers:
        span = data[m["byte_start"]:m["byte_end"]].decode("utf-8")
        assert span in ("'Jürgen'", "tok_9")
    # char offset of 'Jürgen' is 9..17 but byte offsets differ past 'ü'
    assert markers[0]["byte_start"] == data.index(b"'")
    assert markers[1]["byte_start"] == data.index(b"tok_9")
    assert markers[1]["byte_start"] != content.index("tok_9")  # ü/ö widen
