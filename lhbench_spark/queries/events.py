"""Event-stream queries over the `events` table.

The reference is batch-only (SURVEY §2.10) — these queries add the
stream-shaped surface a modern pipeline needs, expressed in batch SQL so
they are oracle-checkable. The Structured Streaming twins of these ops
(same logic over readStream, with watermarks) live in
``lhbench_spark.streaming`` and are covered by unit tests.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lhbench_spark.catalog import table
from lhbench_spark.functions.numeric import dsum, dsum_sql
from lhbench_spark.queries.registry import query


@query(
    "events_tumbling_window",
    tags=("events", "window-agg"),
    oracle=f"""
SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day, event_type,
       COUNT(*) AS cnt,
       {dsum_sql("value")} AS total_value
FROM events
GROUP BY 1, 2
""",
)
def events_tumbling_window(spark, sf_dir):
    """Tumbling time-window aggregation (batch form). In streaming this is
    `F.window(ts, '1 day')` + watermark; the grouping key is identical so
    state size == distinct (day, type) — bounded."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("value").alias("total_value"),
    )


@query(
    "events_json_extract",
    tags=("events", "json"),
    oracle="""
SELECT event_type,
       COUNT(*) AS cnt,
       -- DuckDB SUM(BIGINT) yields HUGEINT (INT128); cast back to BIGINT so
       -- the oracle's k_sum type matches Spark's LongType exactly.
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
FROM events
GROUP BY event_type
""",
)
def events_json_extract(spark, sf_dir):
    """Semi-structured JSON column access — get_json_object stays in the
    JVM (no Python UDF). Integer sum is exact on both engines."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(k).alias("k_sum"),
        F.max(k).alias("k_max"),
    )


@query(
    "events_sessionize",
    tags=("events", "session", "window"),
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
def events_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity) — the classic stateful
    streaming operator, expressed in batch as lag + running sum of
    session starts. Shuffles once on user_id; per-user sort is bounded by
    per-user event counts. The streaming twin uses session_window in
    lhbench_spark.streaming."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.col("ts") - prev_ts > F.expr("INTERVAL 30 MINUTE")),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = ev.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum("is_new").over(run)
    )
    return sess.groupBy("user_id").agg(
        F.countDistinct("session_id").cast("bigint").alias("session_cnt"),
        F.count(F.lit(1)).alias("event_cnt"),
    )
