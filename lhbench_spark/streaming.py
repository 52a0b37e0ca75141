"""Structured Streaming twins of the batch event queries.

The reference is batch-only (SURVEY.md §2.10) — this module adds the
streaming surface a modern pipeline needs, built so every operator has a
BATCH TWIN in ``lhbench_spark.queries.events`` whose results must match
when the stream is drained with ``trigger(availableNow=True)``. That
equivalence (stream == batch over the same input) is the correctness
gate the unit tests enforce — stronger than a rows-only check, and the
property Structured Streaming itself guarantees for these operators.

Scale design:
- state is bounded by watermarks: the tumbling-window agg keeps one row
  of state per (window, event_type) within the watermark horizon;
  session windows hold one state row per open session;
- the file source processes files in bounded batches
  (``maxFilesPerTrigger``) — at 100 TB this is the replay/backfill path,
  while Kafka-style sources swap in without touching the query logic;
- no Python UDF anywhere: window(), session_window(), and the aggregates
  are all JVM-side (whole-stage codegen in each microbatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lhbench_spark.functions.numeric import dsum


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events table (schema declared from the
    batch reader — streaming sources never infer). The ts dtype dispatch
    (micros-native vs legacy nanos-as-long) matches
    lhbench_spark.catalog.table exactly."""
    from lhbench_spark.catalog import table_schema

    raw_schema = table_schema(spark, sf_dir, "events")
    # The streaming file source monitors a DIRECTORY; events.parquet is a
    # single file, so stream the parent dir with a glob filter.
    reader = spark.readStream.schema(raw_schema).option(
        "pathGlobFilter", "events.parquet"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(sf_dir)
    from pyspark.sql.types import LongType, TimestampNTZType

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, TimestampNTZType):
        # withWatermark requires TIMESTAMP (LTZ); the session timezone is
        # pinned to UTC so this cast changes the type, not the wall time.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tumbling_window_counts(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Streaming twin of queries.events.events_tumbling_window: 1-day
    tumbling window + watermark. State = one row per (day, event_type)
    inside the watermark horizon; late events beyond it are dropped —
    the documented difference from the batch twin (batch sees everything)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").cast("date").alias("day"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


def session_counts(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 day") -> DataFrame:
    """Streaming twin of queries.events.events_sessionize via
    session_window (gap-based merging). One state row per open session;
    sessions close when the watermark passes their end.

    Boundary semantics (verified empirically on Spark 4.1): an event at
    EXACTLY start+gap MERGES into the running session — session_window
    extends a session while ``ts - prev <= gap`` — which is identical to
    the batch twin's strict ``ts - lag(ts) > gap`` new-session test, so
    second-aligned streams agree at the gap boundary too."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("event_cnt"))
    )


def sessionize_per_user(sessions: DataFrame) -> DataFrame:
    """Per-user rollup over the (drained) session_counts output, matching
    the batch twin's schema (user_id, session_cnt, event_cnt). This is a
    separate step because chaining a second streaming aggregation after
    session_window is unsupported — production pipelines write the
    session stream to a sink and roll it up downstream, which is exactly
    what this models."""
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("session_cnt"),
        F.sum("event_cnt").alias("event_cnt"),
    )


def user_activity_stateful(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` — the
    escape hatch for per-key state no built-in streaming aggregate can
    express. Per user: event count, value sum, last-seen timestamp, and
    an exponential moving average of ``value`` (order-dependent state —
    EMA depends on the full event sequence, not any commutative
    combination, so ``groupBy().agg()`` cannot compute it).

    State per key is four scalars (bounded, O(|users|) total); each
    microbatch is Arrow-batched into pandas, folded in event order
    (ts, event_id), and emits one updated row per active user. Production
    would add ``GroupStateTimeout.EventTimeTimeout`` to expire idle users;
    kept NoTimeout here so the availableNow drain equals the batch twin
    exactly (the equivalence the unit test enforces)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id bigint, event_cnt bigint, total_value double, "
        "last_ts_us bigint, ema_value double"
    )
    state_schema = "event_cnt bigint, total_value double, last_ts_us bigint, ema double"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        cnt, total, last_us, ema = (
            state.get if state.exists else (0, 0.0, None, None)
        )
        for v, ts in zip(batch["value"], batch["ts"]):
            v = float(v)
            cnt += 1
            total += v
            ema = v if ema is None else alpha * v + (1.0 - alpha) * ema
            last_us = int(ts.value) // 1000  # pandas ns → micros
        state.update((cnt, total, last_us, ema))
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "event_cnt": cnt,
                    "total_value": total,
                    "last_ts_us": last_us,
                    "ema_value": ema,
                }
            ]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_table_appends(table, schema=None) -> DataFrame:
    """A managed table as a STREAMING SOURCE (the lakehouse
    table-streaming analog): a file stream over the table's data tree
    picks up each commit's new files as they land — downstream pipelines
    consume appends continuously instead of polling snapshots.

    Contract: APPEND-ONLY tables (the streaming-ingest shape). A CoW
    rewrite commit re-delivers rewritten files — exactly the reason the
    lakehouse formats gate their streaming reads on append-only history
    too; for update-bearing tables, consume ``changes()`` batch-wise
    instead. Schema comes from the table (streaming sources never
    infer)."""
    import os as _os

    spark = table.spark
    schema = schema or table.read().schema
    return (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(_os.path.join(table.root, "data"))
    )


_DRAINED_SINKS: list[str] = []


def drain_to_table(
    stream_df: DataFrame,
    name: str,
    timeout_sec: int = 120,
    output_mode: str = "complete",
    state_partitions: int | None = None,
) -> DataFrame:
    """Run an availableNow drain of a streaming DataFrame into an
    in-memory sink and return the result table — the test/backfill path
    (process everything currently available, then stop). Stateful
    ``applyInPandasWithState`` streams drain with ``output_mode="update"``
    (complete mode is undefined for arbitrary state).

    ``state_partitions``: a stateful streaming query instantiates one
    state store PER shuffle partition PER stateful operator, and the
    count is frozen into the checkpoint at first start — so real
    streaming jobs size it to their STATE volume explicitly instead of
    inheriting the session's batch shuffle width (32 state stores for a
    five-key aggregation is pure per-store overhead; conversely a 100 TB
    join needs hundreds). When set, the session's shuffle-partition conf
    is applied for the duration of the drain and restored after —
    partitioning never changes drained VALUES (sums are decimal,
    compares are set-based), only state-store fan-out.

    Memory sinks hold their rows on the driver until the temp view is
    dropped; over a long bench session (250+ queries × iterations) the
    leaked sinks became full-GC pressure. Each drain therefore drops all
    PREVIOUS drains' views first — by then their results have been
    collected (the runner collects each query before starting the next)."""
    spark = stream_df.sparkSession
    for old in _DRAINED_SINKS:
        spark.catalog.dropTempView(old)
    _DRAINED_SINKS.clear()
    _DRAINED_SINKS.append(name)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        try:
            # awaitTermination returns False on timeout — in that case the
            # finally-stop() would kill a still-running drain and silently
            # return a PARTIAL table, surfacing later as a baffling oracle
            # mismatch. Fail loudly instead.
            if not q.awaitTermination(timeout_sec):
                raise TimeoutError(
                    f"stream drain '{name}' did not finish within {timeout_sec}s"
                )
        finally:
            q.stop()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(name)


def user_tier_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static dimension (stand-in for any slowly-changing dim table):
    deterministic tier per user. Derived from the batch table so the
    stream-static join has a concrete, reproducible right side."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.select("user_id")
        .distinct()
        .withColumn("tier", (F.col("user_id") % 3).cast("int"))
    )


def enrich_stream_with_dim(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join. The static side is broadcast into
    every microbatch — stateless (no streaming state at all), so it
    composes freely with downstream stateful ops. At 100 TB the static
    side is the bounded one (a dim table), never the stream."""
    return events.join(F.broadcast(dim), "user_id", "left")


def attribution_join(
    views: DataFrame, clicks: DataFrame, horizon_expr: str = "interval 1 hour"
) -> DataFrame:
    """Watermarked stream-stream INNER join — the view→click attribution
    shape (every click within ``horizon_expr`` of a same-user view).
    Both sides carry a watermark and the join condition carries an
    event-time RANGE bound; together they make the state finite, which
    is the whole 100 TB story for stream-stream joins: the engine can
    evict a buffered view once the click-side watermark passes
    view.ts + horizon, and a buffered click once its own watermark
    passes — without the range bound, both sides' state grows without
    limit (Spark requires the watermark; the range bound is what lets
    it actually evict). Inner-join results emit as matches are found,
    so an availableNow drain over a replayed source is value-exact."""
    v = views.withWatermark("ts", "30 minutes").alias("v")
    c = clicks.withWatermark("ts", "30 minutes").alias("c")
    return v.join(
        c,
        F.expr(
            "v.user_id = c.user_id AND c.ts >= v.ts "
            f"AND c.ts <= v.ts + {horizon_expr}"
        ),
        "inner",
    ).select(
        F.col("v.user_id").alias("user_id"),
        F.col("v.ts").alias("view_ts"),
        F.col("c.ts").alias("click_ts"),
        F.col("c.value").alias("click_value"),
    )


def dedup_replay(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Exactly-once replay dedup: drop duplicate event_ids. State holds
    one entry per key seen within the watermark horizon; late duplicates
    beyond it would re-emit — the documented at-least-once boundary every
    streaming dedup carries. Source replays/overlapping backfills become
    idempotent."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def stream_apply_to_replica(
    stream_df: DataFrame, replica, timeout_sec: int = 120
) -> None:
    """Continuous replication consumer: each micro-batch of an
    append-only table stream is applied to ``replica`` as one upsert
    commit (ManagedTable.apply_changes with the batch id as the feed
    version). foreachBatch + checkpoint gives exactly-once per batch —
    the streaming twin of the batch ``changes() → apply_changes()``
    round trip, for pipelines that want a continuously-trailing replica
    instead of scheduled feed replays."""
    from lhbench_spark.session import scratch_dir as _scratch

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        feed = batch_df.withColumn(
            "_change_type", F.lit("update_postimage")
        ).withColumn("_commit_version", F.lit(int(batch_id)))
        replica.apply_changes(feed)

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", _scratch("lhbench_cdcchk_"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(
                f"replica apply stream did not finish in {timeout_sec}s"
            )
    finally:
        q.stop()
