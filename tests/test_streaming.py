"""Streaming stitcher must equal the batch stitcher run-to-completion,
including when micro-batches split the source (state carried across
triggers)."""

from __future__ import annotations


def test_stream_stitch_multibatch_equals_batch(prepared_spark):
    from collector_spark.logs.stitch import stitch_lines_q
    from collector_spark.streaming.log_stream import stream_stitch

    stream_rows = sorted(
        map(tuple, stream_stitch(prepared_spark, max_files_per_trigger=4).collect())
    )
    batch_rows = sorted(map(tuple, stitch_lines_q(prepared_spark).collect()))
    assert len(stream_rows) > 0
    assert stream_rows == batch_rows
