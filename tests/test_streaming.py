"""Streaming ≡ batch equivalence tests.

Each streaming operator is drained with trigger(availableNow=True) into a
memory sink and compared against its batch twin from
lhbench_spark.queries.events over the same input — the strongest
correctness statement available for non-SQL-expressible streaming ops
(and the one Structured Streaming's model promises)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lhbench_spark import streaming
from lhbench_spark.queries.events import events_sessionize, events_tumbling_window
from tests.conftest import SMOKE_SF


def _canon_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_window_stream_equals_batch(spark):
    stream = streaming.stream_events(spark, SMOKE_SF)
    got = streaming.drain_to_table(
        streaming.tumbling_window_counts(stream), "t_tumbling"
    )
    expected = events_tumbling_window(spark, SMOKE_SF)
    assert sorted(got.columns) == sorted(expected.columns)
    assert _canon_rows(got.select(*sorted(got.columns))) == _canon_rows(
        expected.select(*sorted(expected.columns))
    )


def test_sessionize_stream_equals_batch(spark):
    stream = streaming.stream_events(spark, SMOKE_SF)
    sessions = streaming.drain_to_table(
        streaming.session_counts(stream), "t_sessions"
    )
    got = streaming.sessionize_per_user(sessions)
    expected = events_sessionize(spark, SMOKE_SF)
    cols = ["user_id", "session_cnt", "event_cnt"]
    assert _canon_rows(got.select(*cols)) == _canon_rows(expected.select(*cols))


def test_bounded_microbatches(spark):
    """maxFilesPerTrigger bounds each microbatch (the backfill/replay
    path); result is identical regardless of batch slicing."""
    stream = streaming.stream_events(spark, SMOKE_SF, max_files_per_trigger=1)
    got = streaming.drain_to_table(
        streaming.tumbling_window_counts(stream), "t_bounded"
    )
    total = got.agg(F.sum("cnt").alias("n")).collect()[0]["n"]
    batch_total = (
        events_tumbling_window(spark, SMOKE_SF)
        .agg(F.sum("cnt").alias("n"))
        .collect()[0]["n"]
    )
    assert total == batch_total
