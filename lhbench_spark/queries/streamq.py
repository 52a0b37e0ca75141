"""Structured Streaming queries, registered as oracle-checked entries.

The reference is batch-only (SURVEY.md §2.10); this module makes the
streaming surface a first-class, value-checked part of the inventory.
Each entry builds a streaming pipeline from ``lhbench_spark.streaming``,
drains it with ``trigger(availableNow=True)`` (process everything
currently available, then stop — the backfill/replay semantics), and
returns the drained result as a plain DataFrame. Because availableNow
over a static source is batch-equivalent, the DuckDB oracles can verify
VALUES, not just row counts — including the ``applyInPandasWithState``
custom stateful operator, whose order-dependent EMA fold is replayed in
DuckDB with ``list_reduce`` over the identically-ordered value list
(same IEEE double ops in the same order ⇒ bit-identical).

At 100 TB these exact pipelines run unbounded: swap the file source for
Kafka, keep the watermarks; state stays bounded (per-window, per-session,
or per-user scalars) regardless of stream length.
"""

from __future__ import annotations

import itertools
import tempfile

from pyspark.sql import functions as F

from lhbench_spark import streaming
from lhbench_spark.catalog import table
from lhbench_spark.functions.numeric import dsum, dsum_sql
from lhbench_spark.queries.registry import query

# Memory-sink table names must be unique per drain (bench iterations and
# correctness runs share a session).
_SINK_SEQ = itertools.count()


def _sink(prefix: str) -> str:
    return f"{prefix}_{next(_SINK_SEQ)}"


@query(
    "continuous_tumbling_window",
    tags=("streaming", "window-agg", "events"),
    oracle=f"""
SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day, event_type,
       COUNT(*) AS cnt,
       {dsum_sql("value")} AS total_value
FROM events
GROUP BY 1, 2
""",
)
def continuous_tumbling_window(spark, sf_dir):
    """Streaming tumbling-window aggregation (window() + watermark),
    drained with availableNow — value-identical to the batch twin
    (events_tumbling_window) because nothing is late relative to a full
    replay. State = one row per (day, event_type) in the horizon."""
    stream = streaming.stream_events(spark, sf_dir)
    return streaming.drain_to_table(
        streaming.tumbling_window_counts(stream),
        _sink("t_stream_tumbling"),
        state_partitions=8,
    )


@query(
    "continuous_sessionize",
    tags=("streaming", "session-window", "events"),
    oracle="""
WITH gaps AS (
    SELECT user_id, ts, event_id,
           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_new
    FROM events
), sess AS (
    SELECT user_id,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM gaps
)
SELECT user_id,
       CAST(COUNT(DISTINCT session_id) AS BIGINT) AS session_cnt,
       COUNT(*) AS event_cnt
FROM sess
GROUP BY user_id
""",
)
def continuous_sessionize(spark, sf_dir):
    """session_window (30-min gap) streaming sessionization + per-user
    rollup of the drained session stream. The oracle recomputes sessions
    relationally (lag + running sum of session starts) — gap-merge
    semantics are value-checked, not assumed."""
    stream = streaming.stream_events(spark, sf_dir)
    sessions = streaming.drain_to_table(
        streaming.session_counts(stream),
        _sink("t_stream_sessions"),
        state_partitions=8,
    )
    return streaming.sessionize_per_user(sessions)


# The stateful fold replayed in DuckDB: identical alpha constants
# (rendered from the SAME Python floats the pandas fold uses), identical
# (ts, event_id) order, identical left-fold structure. list_reduce seeds
# the accumulator with the first element — exactly the fold's
# "first value initializes the EMA" rule.
_EMA_ALPHA = 0.3
_EMA_BETA = 1.0 - _EMA_ALPHA

_STATEFUL_ORACLE = f"""
WITH ordered AS (
    SELECT user_id,
           list(value ORDER BY ts, event_id) AS vals,
           COUNT(*) AS event_cnt,
           epoch_us(MAX(ts)) AS last_ts_us
    FROM events
    GROUP BY user_id
)
SELECT user_id, event_cnt,
       list_reduce(vals, (acc, x) -> acc + x) AS total_value,
       last_ts_us,
       list_reduce(vals, (acc, x) ->
           CAST({_EMA_ALPHA!r} AS DOUBLE) * x
           + CAST({_EMA_BETA!r} AS DOUBLE) * acc) AS ema_value
FROM ordered
"""


@query(
    "continuous_stateful_ema",
    tags=("streaming", "stateful", "applyInPandasWithState", "events"),
    oracle=_STATEFUL_ORACLE,
)
def continuous_stateful_ema(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState): per-user count,
    sequential value sum, last-seen micros, and an order-dependent EMA —
    state no built-in streaming aggregate can express. The oracle replays
    the same left fold in DuckDB over the identically-ordered list, so
    the Arrow/pandas state path is value-checked bit-for-bit."""
    stream = streaming.stream_events(spark, sf_dir)
    return streaming.drain_to_table(
        streaming.user_activity_stateful(stream, alpha=_EMA_ALPHA),
        _sink("t_stream_stateful"),
        output_mode="update",
        state_partitions=8,
    )


@query(
    "continuous_dedup_replay",
    tags=("streaming", "dedup", "exactly-once", "events"),
    oracle=f"""
SELECT COUNT(DISTINCT event_id) AS n_ids,
       COUNT(DISTINCT event_id) AS cnt,
       {dsum_sql("value")} AS value_sum
FROM events
""",
)
def continuous_dedup_replay(spark, sf_dir):
    """Exactly-once replay dedup: the SAME source batch lands twice (an
    overlapping backfill), the stream drops duplicate event_ids, and the
    drained result aggregates to exactly one copy of every event — the
    oracle aggregates the pristine source once. State: one entry per
    event_id inside the watermark horizon."""
    import shutil

    # Duplicate the source by copying the parquet file twice — byte-level
    # file copies, not Spark write jobs (the duplication IS the scenario;
    # re-encoding it through the engine would just bill two writes).
    src = tempfile.mkdtemp(prefix="lhbench_replay_") + "/events"
    import os

    os.makedirs(src)
    shutil.copy(f"{sf_dir}/events.parquet", f"{src}/batch_a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", f"{src}/batch_b.parquet")
    base = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = spark.readStream.schema(base.schema).parquet(src)
    ts_type = base.schema["ts"].dataType.typeName()
    if ts_type == "long":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    got = streaming.drain_to_table(
        streaming.dedup_replay(stream),
        _sink("t_stream_replay"),
        output_mode="append",
        state_partitions=8,
    )
    return got.agg(
        F.countDistinct("event_id").cast("bigint").alias("n_ids"),
        F.count(F.lit(1)).alias("cnt"),
        dsum("value").alias("value_sum"),
    )


@query(
    "continuous_stream_join",
    tags=("streaming", "stream-stream-join", "watermark", "events"),
    oracle=f"""
SELECT COUNT(*) AS pairs,
       CAST(COUNT(DISTINCT v.user_id) AS BIGINT) AS n_users,
       {dsum_sql("c.value")} AS click_value_sum
FROM events v
JOIN events c
  ON v.user_id = c.user_id
 AND v.event_type = 'view' AND c.event_type = 'click'
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
""",
)
def continuous_stream_join(spark, sf_dir):
    """Stream-stream watermarked INNER join (view→click attribution):
    two independent streams over the same source, joined on user_id
    with an event-time range bound (click within 1 hour of the view).
    The oracle recomputes the attribution relationally on the batch
    table — a full availableNow replay has no late data, so the drained
    join must be value-exact. State: each side buffers only its
    watermark horizon; the range bound is what lets the engine evict
    (streaming.attribution_join)."""
    views = streaming.stream_events(spark, sf_dir).filter("event_type = 'view'")
    clicks = streaming.stream_events(spark, sf_dir).filter("event_type = 'click'")
    got = streaming.drain_to_table(
        streaming.attribution_join(views, clicks),
        _sink("t_stream_attrib"),
        output_mode="append",
        state_partitions=8,
    )
    return got.agg(
        F.count(F.lit(1)).alias("pairs"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        dsum("click_value").alias("click_value_sum"),
    )


@query(
    "continuous_enrich_static",
    tags=("streaming", "stream-static-join", "events"),
    oracle="""
SELECT CAST(user_id % 3 AS INT) AS tier,
       COUNT(*) AS cnt,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1
""",
)
def continuous_enrich_static(spark, sf_dir):
    """Stream-static enrichment join (static dim broadcast into every
    microbatch, stateless) + rollup of the enriched stream by tier. The
    oracle recomputes the tier from the join key directly, so a dropped
    or duplicated stream row fails the value check."""
    dim = streaming.user_tier_dim(spark, sf_dir)
    stream = streaming.stream_events(spark, sf_dir)
    enriched = streaming.drain_to_table(
        streaming.enrich_stream_with_dim(stream, dim),
        _sink("t_stream_enrich"),
        output_mode="append",
    )
    return enriched.groupBy("tier").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


@query(
    "continuous_sink_table",
    tags=("streaming", "foreachBatch", "managed-table", "events"),
    oracle=f"""
SELECT COUNT(*) AS cnt,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_ids,
       {dsum_sql("value")} AS value_sum
FROM events
""",
)
def continuous_sink_table(spark, sf_dir):
    """Streaming sink into the versioned managed table via foreachBatch
    (the Delta streaming-sink analog): each microbatch lands as an APPEND
    commit carrying the stream's ``batch_id`` as a transactional version
    (``txn_app_id``/``txn_version``, the Delta txnAppId contract) — so a
    batch replayed after a crash-restart commits exactly once even
    though foreachBatch itself is only at-least-once. The stream
    inherits the table's versioned manifests, history, and time travel;
    the drained table must hold exactly the source's rows —
    value-checked against the raw events table."""
    import tempfile as _tf

    from lhbench_spark.session import scratch_dir as _scratch

    from lhbench_spark.tables import ManagedTable

    root = _tf.mkdtemp(prefix="lhbench_ssink_") + "/t"
    stream = streaming.stream_events(spark, sf_dir)
    # Pre-create the EMPTY table so every batch — including batch 0 —
    # goes through the txn-tagged append path: a create-on-first-batch
    # would commit batch 0 with no ledger entry, and a replay of batch 0
    # (crash before the checkpoint commit) would land its rows twice.
    ManagedTable.create(
        spark, root, spark.createDataFrame([], stream.schema),
        num_files=1, validate_count=False,
    )

    def sink(batch_df, batch_id):
        ManagedTable(batch_df.sparkSession, root).append(
            batch_df, num_files=1,
            txn_app_id="continuous_sink", txn_version=int(batch_id),
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", _scratch("lhbench_sschk_"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        # False = timeout: the table would be partially written — raise
        # rather than return a silently-truncated result (same contract
        # as streaming.drain_to_table).
        if not q.awaitTermination(120):
            raise TimeoutError("managed-table stream sink did not finish in 120s")
    finally:
        q.stop()
    t = ManagedTable(spark, root)
    return t.read().agg(
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("event_id").cast("bigint").alias("n_ids"),
        dsum("value").alias("value_sum"),
    )


_TABLE_SOURCE_ORACLE = """
WITH src AS (
    SELECT * FROM orders WHERE o_orderkey % 3 = 0
)
SELECT o_orderpriority,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,8))) AS DOUBLE) AS price_sum
FROM src
GROUP BY o_orderpriority
"""


@query(
    "cdc_table_stream",
    tags=("streaming", "managed-table", "source"),
    oracle=_TABLE_SOURCE_ORACLE,
)
def cdc_table_stream_q(spark, sf_dir):
    """The managed table as a STREAMING SOURCE: three append commits land
    on a table, and a file stream over its data tree drains them
    (availableNow) into an aggregation that must equal the relational
    recompute — the lakehouse table-streaming read path, closing the
    loop with continuous_sink_table (stream → table → stream)."""
    import tempfile as _tf

    from lhbench_spark.catalog import table
    from lhbench_spark.tables import ManagedTable

    src = table(spark, sf_dir, "orders").filter(F.expr("o_orderkey % 3 = 0"))
    root = _tf.mkdtemp(prefix="lhbench_tsrc_") + "/t"
    parts = [src.filter(F.expr(f"o_orderkey % 9 = {3 * i}")) for i in range(3)]
    t = ManagedTable.create(spark, root, parts[0], num_files=1, validate_count=False)
    t.append(parts[1], num_files=1)
    t.append(parts[2], num_files=1)

    stream = streaming.stream_table_appends(t)
    agg = stream.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("o_totalprice").cast("decimal(18,8)")).cast("double")
        .alias("price_sum"),
    )
    return streaming.drain_to_table(
        agg,
        _sink("t_table_appends"),
        output_mode="complete",
        state_partitions=8,
    )


_CDC_REPLICA_ORACLE = """
WITH src AS (
    SELECT * FROM orders WHERE o_orderkey % 6 = 1
)
SELECT o_orderpriority,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,8))) AS DOUBLE) AS price_sum
FROM src
GROUP BY o_orderpriority
"""


@query(
    "continuous_cdc_replica",
    tags=("streaming", "cdc", "replica", "managed-table"),
    oracle=_CDC_REPLICA_ORACLE,
)
def continuous_cdc_replica(spark, sf_dir):
    """End-to-end CONTINUOUS replication: source table A takes three
    append commits; a table-stream over A feeds foreachBatch, which
    applies every micro-batch to replica B as an upsert commit
    (streaming.stream_apply_to_replica). B starts EMPTY and must end
    row-identical to A — the oracle recomputes A's content from the
    source predicate. The streaming twin of cdc_apply_replica: same
    consumer (apply_changes), driven by a stream instead of a feed
    replay."""
    import tempfile as _tf

    from lhbench_spark.tables import ManagedTable

    orders = table(spark, sf_dir, "orders").filter(F.expr("o_orderkey % 6 = 1"))
    a_root = _tf.mkdtemp(prefix="lhbench_cdcsrc_") + "/t"
    b_root = _tf.mkdtemp(prefix="lhbench_cdcrep_") + "/t"
    # the k%6==1 slice splits into three disjoint thirds: k%18 ∈ {1,7,13}
    a = ManagedTable.create(
        spark, a_root, orders.filter("o_orderkey % 18 = 1"), num_files=2,
        primary_keys=("o_orderkey",), validate_count=False,
    )
    a.append(orders.filter("o_orderkey % 18 = 7"), num_files=1)
    a.append(orders.filter("o_orderkey % 18 = 13"), num_files=1)
    b = ManagedTable.create(
        spark, b_root, a.read().limit(0), num_files=1,
        primary_keys=("o_orderkey",), validate_count=False,
    )
    stream = streaming.stream_table_appends(a)
    streaming.stream_apply_to_replica(stream, b)
    return b.read().groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("o_totalprice").cast("decimal(18,8)"))
        .cast("double")
        .alias("price_sum"),
    )
