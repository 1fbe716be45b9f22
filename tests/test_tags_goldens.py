"""Reference goldens for full-contract query-tag parsing — the complete
parseTags table from logs/querysample/tags_test.go:16-109, asserted as the
final key->value map per query (later comments win on conflicts; string
literals never open a comment)."""

from __future__ import annotations

import pytest

CASES = [
    ("SELECT 1", {}),
    ("SELECT 1 /* abc:123, def:456 */", {"abc": "123", "def": "456"}),
    (
        "SELECT 1 /*controller_with_namespace:Api::V1::SubmittedInspectionFormsController,"
        "action:index,line:/config/initializers/kaminari_total_count.rb:60:in `total_count'*/",
        {
            "controller_with_namespace": "Api::V1::SubmittedInspectionFormsController",
            "action": "index",
            "line": "/config/initializers/kaminari_total_count.rb:60:in `total_count'",
        },
    ),
    ("SELECT 1 /* abc=123,def=456 */", {"abc": "123", "def": "456"}),
    ("SELECT 1 /* hello=world,foo */", {"hello": "world"}),
    (
        "SELECT 1 /* hello: world, foo, bar: 123 */",
        {"hello": "world", "bar": "123"},
    ),
    ("SELECT '/* not a comment */' /* a:42 */", {"a": "42"}),
    (
        "/* a:1,b:2 */ SELECT 1 /* c:3,d:4 */",
        {"a": "1", "b": "2", "c": "3", "d": "4"},
    ),
    (
        "/* a:1,b:2 */ SELECT 1 /* c:3,a:4 */",
        {"a": "4", "b": "2", "c": "3"},
    ),
    ("SELECT 1 /* foo='bar%20quux' */", {"foo": "bar quux"}),
    (
        "SELECT 1, 'string', '/* ignore */' /* foo='bar%20quux',"
        "fred='http://example.org/a%20b%20c\\'',"
        "thud%20thud%25thud\\'='\\'%25%20%25 %20' */",
        {
            "foo": "bar quux",
            "fred": "http://example.org/a b c'",
            "thud thud%thud'": "'% %  ",
        },
    ),
    (
        "SELECT 1 /* traceparent:00-7dd3a87ae5bdacc0c56f3ba452a22fed-b39c2eabd3993833-01,"
        "tracestate:pganalyze=t:1701420562.550783 */",
        {
            "traceparent": "00-7dd3a87ae5bdacc0c56f3ba452a22fed-b39c2eabd3993833-01",
            "tracestate": "pganalyze=t:1701420562.550783",
        },
    ),
    (
        "SELECT 1 /* traceparent='00-7dd3a87ae5bdacc0c56f3ba452a22fed-b39c2eabd3993833-01',"
        "tracestate='pganalyze%3Dt%3A1701420562.550783' */",
        {
            "traceparent": "00-7dd3a87ae5bdacc0c56f3ba452a22fed-b39c2eabd3993833-01",
            "tracestate": "pganalyze=t:1701420562.550783",
        },
    ),
]


@pytest.fixture(scope="module")
def parsed(prepared_spark):
    from collector_spark.logs.querysample import _comment_tags_full_from

    df = prepared_spark.createDataFrame(
        [(i, q) for i, (q, _) in enumerate(CASES)],
        "sample_id long, query_text string",
    )
    rows = _comment_tags_full_from(df).collect()
    out: dict[int, dict[str, str]] = {i: {} for i in range(len(CASES))}
    for r in rows:
        out[r["sample_id"]][r["tag_key"]] = r["tag_value"]
    return out


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_tags_golden(parsed, idx):
    _, want = CASES[idx]
    assert parsed[idx] == want
