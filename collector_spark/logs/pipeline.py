"""Composed oracle SQL for the log pipeline stages.

Each stage's oracle nests the previous stage's SQL as a CTE (SQL allows
WITH inside a derived table), so the oracle exercises the identical
composition the Spark plan runs: parse -> stitch -> {associate -> redact,
classify}.
"""

from __future__ import annotations

from collector_spark.logs import associate, classify, parse, redact, stitch


def oracle_parse() -> str:
    return parse.oracle_parse_lines()


def oracle_stitch() -> str:
    return stitch.oracle_stitch_lines(parse.oracle_parse_lines())


def oracle_associate() -> str:
    return associate.oracle_associate(oracle_stitch())


def oracle_classify() -> str:
    return classify.oracle_classify(oracle_stitch())


def oracle_redact() -> str:
    return redact.oracle_redact(oracle_associate())


def oracle_marker_spans() -> str:
    return redact.oracle_marker_spans(oracle_associate())


def oracle_redact_markers_json() -> str:
    return redact.oracle_redact_markers_json(oracle_associate())
