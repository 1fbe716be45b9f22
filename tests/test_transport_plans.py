"""Scale contract proofs for the S31 transport normalizers: every envelope
normalizer is a per-row projection, so — apart from the single range
exchange introduced by the verification-only output sort — the plans must
contain NO shuffles (no hashpartitioning exchange, no aggregation, no
join). At 100 TB a receiver that shuffles per line is unusable; these pin
the map-only shape."""

from __future__ import annotations

import os
import tempfile
import uuid

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture
def leaf_fixture(prepared_spark):
    """Materialize a fixture view to parquet so the operator plan under
    test starts from a scan leaf — the envelope *rendering* (a test-data
    concern) legitimately aggregates, the normalizer must not. Restores
    the SQL-derived view afterwards."""
    from collector_spark.fixtures.defs import register_fixture_views

    replaced: list[str] = []

    def materialize(name: str) -> None:
        path = os.path.join(
            tempfile.gettempdir(), "collector_spark_planfix", uuid.uuid4().hex, name
        )
        prepared_spark.table(name).write.mode("overwrite").parquet(path)
        prepared_spark.read.parquet(path).createOrReplaceTempView(name)
        replaced.append(name)

    yield materialize
    register_fixture_views(prepared_spark, replaced)


TRANSPORTS = [
    "syslog_items",
    "gcp_items",
    "azure_items",
    "otel_items",
]


_FIXTURE_FOR = {
    "syslog_items": "syslog_frames",
    "gcp_items": "gcp_pubsub_messages",
    "azure_items": "azure_eventhub_batches",
    "otel_items": "otel_log_records",
}


@pytest.mark.parametrize("name", TRANSPORTS)
def test_transport_is_map_only(prepared_spark, leaf_fixture, name):
    from collector_spark.logs import transport

    leaf_fixture(_FIXTURE_FOR[name])
    df = getattr(transport, name)(prepared_spark)
    plan = _plan(df)
    # the only permissible exchange is the rangepartitioning for the
    # deterministic output sort; a hashpartitioning exchange would mean the
    # normalizer aggregates or joins per line
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan, plan
    assert "HashAggregate" not in plan, plan


def test_transport_classify_is_map_only(prepared_spark):
    """The transport -> classification composition stays stateless: the
    entire 110-rule chain is a projection over the normalized items."""
    from collector_spark.logs import transport

    plan = _plan(transport.syslog_classified(prepared_spark))
    assert "Exchange hashpartitioning" not in plan, plan
    assert "HashAggregate" not in plan, plan


def test_heroku_items_no_wide_ops(prepared_spark, leaf_fixture):
    """The de-framer is an Arrow-batched mapInPandas per drain body plus a
    projection — no joins or aggregations anywhere in the items plan."""
    from collector_spark.logs import transport

    leaf_fixture("heroku_drain_bodies")
    plan = _plan(transport.heroku_items(prepared_spark))
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan, plan
    assert "HashAggregate" not in plan, plan


def test_repetition_signals_shuffles_on_doc_id_only(prepared_spark):
    """Gopher repetition signals: every aggregation/join keys on doc_id —
    the explodes stream map-side and nothing global ever shuffles."""
    from collector_spark.ml.curation import repetition_signals

    plan = _plan(repetition_signals(prepared_spark))
    assert "Exchange SinglePartition" not in plan, plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "doc_id" in line, line
