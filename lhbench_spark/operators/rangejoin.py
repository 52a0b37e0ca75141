"""Bucketed interval (range) join.

Joining point events against time intervals (`start <= ts < end`) has no
equi-key, so naive SQL plans it as a broadcast-nested-loop / cross join —
O(|intervals| x |events|) comparisons, the classic range-join trap.

The scalable formulation bucketizes time: explode each interval into the
fixed-width buckets it covers (`sequence()` — bounded by interval length /
bucket width), bucket each event by truncation, equi-join on the bucket,
then apply the exact range predicate as a residual filter. Each event
carries exactly ONE bucket, so a (interval, event) pair can only meet in
that bucket — no post-join dedupe needed. Cost: one hash shuffle on the
bucket key, candidate volume = sum over buckets of
|intervals covering bucket| x |events in bucket| — linear-ish for
bounded-length intervals, versus the quadratic cross join. Bucket width
is the knob: ~= the typical interval length, so each interval explodes
into O(1) buckets.

This is the DataFrame twin of range-partitioned interval joins in
streaming systems; DuckDB plans the same query with its IEJoin, which is
why the plain range join is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    intervals: DataFrame,
    events: DataFrame,
    start: str = "start_ts",
    end: str = "end_ts",
    ts: str = "ts",
    bucket_seconds: int = 21600,
    how: str = "inner",
) -> DataFrame:
    """Join every event row to every interval row with
    ``start <= ts < end`` (end-exclusive). Returns all interval columns +
    all event columns. ``bucket_seconds`` should approximate the typical
    interval length so each interval explodes into O(1) bucket rows."""
    bw = int(bucket_seconds)
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.expr(
                # upper bound uses floor(end), not floor(end-1): with
                # sub-second timestamps an event in the final partial
                # bucket would otherwise be missed; the extra bucket at an
                # exact-boundary end is discarded by the residual filter.
                f"sequence(CAST(floor(unix_timestamp({start}) / {bw}) AS BIGINT), "
                f"CAST(floor(unix_timestamp({end}) / {bw}) AS BIGINT))"
            )
        ),
    )
    ev = events.withColumn(
        "_bkt", F.expr(f"CAST(floor(unix_timestamp({ts}) / {bw}) AS BIGINT)")
    )
    return (
        iv.join(ev, "_bkt", how)
        .filter((F.col(start) <= F.col(ts)) & (F.col(ts) < F.col(end)))
        .drop("_bkt")
    )
