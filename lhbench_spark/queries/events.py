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


# Hypertable-style continuous aggregate: the DAILY rollup is derived from
# the HOURLY aggregate (sum of counts / sum of sums), never from raw
# events — at 100 TB the hourly table is the materialized continuous
# aggregate and every coarser granularity reads it, turning a 10^12-row
# scan into a 10^5-row one. avg is recomputed as sum/cnt at the coarse
# level (averaging averages would be wrong under uneven hours).
_HYPER_ORACLE = f"""
WITH hourly AS (
    SELECT DATE_TRUNC('hour', ts) AS hr, event_type,
           COUNT(*) AS cnt, {dsum_sql("value")} AS value_sum
    FROM events GROUP BY 1, 2
)
SELECT CAST(DATE_TRUNC('day', hr) AS DATE) AS day, event_type,
       CAST(SUM(cnt) AS BIGINT) AS cnt,
       CAST(SUM(CAST(value_sum AS DECIMAL(18,8))) AS DOUBLE) AS value_sum,
       ROUND(CAST(SUM(CAST(value_sum AS DECIMAL(18,8))) AS DOUBLE) / SUM(cnt), 6)
           AS value_avg,
       CAST(COUNT(*) AS BIGINT) AS hours_present
FROM hourly
GROUP BY 1, 2
"""


@query("events_hypertable_rollup", tags=("events", "rollup", "hypertable"), oracle=_HYPER_ORACLE)
def events_hypertable_rollup(spark, sf_dir):
    """Multi-granularity time rollup (continuous-aggregate pattern):
    hour-level agg feeds the day-level agg. Two narrow shuffles, the
    second over the already-collapsed hourly table."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hr"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"), dsum("value").alias("value_sum"))
    return hourly.groupBy(
        F.date_trunc("day", F.col("hr")).cast("date").alias("day"), "event_type"
    ).agg(
        F.sum("cnt").alias("cnt"),
        F.sum(F.col("value_sum").cast("decimal(18,8)")).cast("double").alias("value_sum"),
        F.round(
            F.sum(F.col("value_sum").cast("decimal(18,8)")).cast("double")
            / F.sum("cnt"),
            6,
        ).alias("value_avg"),
        F.count(F.lit(1)).cast("bigint").alias("hours_present"),
    )


# Interval owners: every 10th user's first 6 active hours. The oracle is
# the PLAIN range join (DuckDB plans it as an IEJoin) — the bucketed
# equi-join + residual formulation in operators/rangejoin.py must be
# result-identical, which is exactly what the hash check proves.
_RANGE_JOIN_ORACLE = f"""
WITH iv AS (
    SELECT user_id AS owner_id, MIN(ts) AS start_ts,
           MIN(ts) + INTERVAL 6 HOUR AS end_ts
    FROM events WHERE user_id % 10 = 0 GROUP BY user_id
)
SELECT iv.owner_id,
       COUNT(*) AS cnt,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
       {dsum_sql("e.value")} AS value_sum
FROM iv JOIN events e ON iv.start_ts <= e.ts AND e.ts < iv.end_ts
GROUP BY iv.owner_id
"""


@query("join_range_interval", tags=("join", "range", "interval", "extension"), oracle=_RANGE_JOIN_ORACLE)
def join_range_interval(spark, sf_dir):
    """Bucketed interval join (operators/rangejoin.py): each sampled
    user's first-6-hours window joined against ALL events inside it —
    time-bucket equi-join + residual filter, never the
    O(|intervals| x |events|) nested loop. Aggregated per interval owner
    (bounded output)."""
    from lhbench_spark.operators.rangejoin import interval_join

    ev = table(spark, sf_dir, "events")
    iv = (
        ev.filter(F.col("user_id") % 10 == 0)
        .groupBy(F.col("user_id").alias("owner_id"))
        .agg(F.min("ts").alias("start_ts"))
        .withColumn("end_ts", F.col("start_ts") + F.expr("INTERVAL 6 HOURS"))
    )
    joined = interval_join(iv, ev, bucket_seconds=21600)
    return joined.groupBy("owner_id").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        dsum("value").alias("value_sum"),
    )


# -- Funnel analysis -------------------------------------------------------
# The classic product-analytics sequence query (Flink CEP / Snowplow
# funnel shape): users who did view -> click -> purchase in first-touch
# order. One hash-agg shuffle on user_id, then a single-row global agg of
# booleans — no self-joins, no window over the raw stream. At 100 TB the
# per-user state is 3 timestamps regardless of event volume.
_FUNNEL_ORACLE = """
WITH s AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
           MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
    FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       COUNT(t_view) AS n_view,
       CAST(SUM(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT)
           AS n_view_then_click,
       CAST(SUM(CASE WHEN t_click > t_view AND t_purchase > t_click
                THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
FROM s
"""


@query("events_funnel", tags=("events", "funnel", "extension"), oracle=_FUNNEL_ORACLE)
def events_funnel(spark, sf_dir):
    """First-touch funnel view -> click -> purchase. NULL-comparison
    semantics prune users missing a stage (NULL > NULL is NULL -> 0)."""
    ev = table(spark, sf_dir, "events")
    stages = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    c2 = F.col("t_click") > F.col("t_view")
    c3 = c2 & (F.col("t_purchase") > F.col("t_click"))
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_view"),
        F.sum(F.when(c2, 1).otherwise(0)).alias("n_view_then_click"),
        F.sum(F.when(c3, 1).otherwise(0)).alias("n_full_funnel"),
    )


# -- Cohort retention ------------------------------------------------------
# cohort_day = a user's first active day; n_active = users from that
# cohort active at day_offset 0..7. The (user, day) distinct and the
# per-user min reuse the SAME user_id hash partitioning, and the join is
# user-keyed — one logical shuffle chain, no fact-x-fact re-shuffle.
_RETENTION_ORACLE = """
WITH activity AS (
    SELECT DISTINCT user_id, CAST(DATE_TRUNC('day', ts) AS DATE) AS day
    FROM events
), cohort AS (
    SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id
)
SELECT c.cohort_day,
       CAST(datediff('day', c.cohort_day, a.day) AS INTEGER) AS day_offset,
       COUNT(*) AS n_active
FROM activity a JOIN cohort c ON a.user_id = c.user_id
WHERE datediff('day', c.cohort_day, a.day) BETWEEN 0 AND 7
GROUP BY 1, 2
"""


@query("events_retention", tags=("events", "retention", "extension"), oracle=_RETENTION_ORACLE)
def events_retention(spark, sf_dir):
    """Day-N cohort retention matrix (offset 0..7). Output is bounded by
    distinct-days x 8 regardless of corpus size."""
    ev = table(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        activity.join(cohort, "user_id")
        .withColumn("day_offset", F.datediff(F.col("day"), F.col("cohort_day")))
        .filter(F.col("day_offset").between(0, 7))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


# -- JSON -> MAP -> explode ------------------------------------------------
# The semi-structured flattening path: parse the props blob into a
# MAP<STRING,STRING>, explode to (key, value) rows, histogram the values
# per key. Exercises from_json + MapType + the generator path (SURVEY
# §2.8 JSON family); the generator fuses into the scan, and the agg
# collapses map-side to keys x buckets rows before the shuffle. Values
# are non-negative so truncating vs flooring integer division agree.
_MAP_EXPLODE_ORACLE = """
WITH kv AS (
    SELECT unnest(json_keys(props)) AS key,
           json_extract_string(props, '$.' || unnest(json_keys(props))) AS val
    FROM events
)
SELECT key,
       TRY_CAST(val AS BIGINT) // 10 AS val_bucket,
       COUNT(*) AS cnt,
       CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct_vals,
       CAST(SUM(TRY_CAST(val AS BIGINT)) AS BIGINT) AS val_sum
FROM kv
GROUP BY 1, 2
"""


@query("events_map_explode", tags=("events", "json", "map", "extension"), oracle=_MAP_EXPLODE_ORACLE)
def events_map_explode(spark, sf_dir):
    """Parse props into a map, explode to key/value rows, bucket-histogram
    the integer values per key — the flatten step for semi-structured
    property bags."""
    ev = table(spark, sf_dir, "events")
    kv = ev.select(
        F.explode(F.from_json("props", "map<string,string>")).alias("key", "val")
    )
    return kv.groupBy(
        "key", F.expr("try_cast(val AS BIGINT) div 10").alias("val_bucket")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("val").cast("bigint").alias("n_distinct_vals"),
        F.sum(F.expr("try_cast(val AS BIGINT)")).alias("val_sum"),
    )


_HOP_US = 43_200_000_000  # 12h slide, in microseconds
_HOP_ORACLE = f"""
WITH fanned AS (
    -- every event belongs to size/slide = 2 hopping windows; regenerate
    -- Spark's epoch-aligned window starts with integer microsecond math
    SELECT make_timestamp(
               (epoch_us(ts) // {_HOP_US}) * {_HOP_US} - j * {_HOP_US}
           ) AS win_start,
           event_type, value
    FROM events, range(0, 2) t(j)
)
SELECT win_start, event_type,
       COUNT(*) AS cnt,
       {dsum_sql("value")} AS total_value
FROM fanned
GROUP BY 1, 2
"""


@query(
    "events_hopping_window",
    tags=("events", "window-agg", "hopping"),
    oracle=_HOP_ORACLE,
)
def events_hopping_window(spark, sf_dir):
    """Hopping (sliding) window aggregation: 1-day windows every 12h, so
    each event lands in exactly two overlapping windows. Spark expands
    events into per-window rows before the hash agg (same Expand shape as
    rollup); the oracle regenerates the epoch-aligned starts with integer
    microsecond arithmetic — engine-exact. The streaming twin is the same
    F.window(size, slide) under a watermark."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 day", "12 hours").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"), "event_type", "cnt", "total_value"
        )
    )


_GAPFILL_ORACLE = f"""
WITH hourly AS (
    SELECT date_trunc('hour', ts) AS hr, event_type,
           COUNT(*) AS cnt, {dsum_sql("value")} AS value_sum
    FROM events GROUP BY 1, 2
), b AS (
    SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM hourly
), grid AS (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr, et.event_type
    FROM b, (SELECT DISTINCT event_type FROM events) et
), j AS (
    SELECT g.hr, g.event_type, h.cnt, h.value_sum
    FROM grid g LEFT JOIN hourly h ON g.hr = h.hr AND g.event_type = h.event_type
)
SELECT event_type, hr,
       COALESCE(cnt, 0) AS cnt,
       (cnt IS NULL) AS is_gap,
       ROUND(LAST_VALUE(value_sum IGNORE NULLS)
                 OVER (PARTITION BY event_type ORDER BY hr
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             6) AS locf_value
FROM j
"""


@query(
    "adhoc_gapfill_locf",
    tags=("events", "gapfill", "locf", "hypertable", "extension"),
    oracle=_GAPFILL_ORACLE,
)
def adhoc_gapfill_locf(spark, sf_dir):
    """Time-bucket gap filling with last-observation-carried-forward —
    the hypertable `time_bucket_gapfill + locf` pattern a metrics/
    training-telemetry pipeline needs: generate the full hourly grid per
    event type (sequence + explode over the observed [min, max] span —
    the 2-row bounds aggregate broadcasts), LEFT JOIN the real hourly
    aggregates, mark gaps, and carry the last non-null value forward
    with an ignore-nulls running window. Grid size = hours × types —
    bounded by the time span, not the event volume, at any scale."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hr"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"), dsum("value").alias("value_sum"))
    bounds = hourly.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    hours = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hr")
    )
    grid = hours.crossJoin(F.broadcast(ev.select("event_type").distinct()))
    j = grid.join(hourly, ["hr", "event_type"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "event_type",
        "hr",
        F.coalesce("cnt", F.lit(0)).alias("cnt"),
        F.col("cnt").isNull().alias("is_gap"),
        F.round(F.last("value_sum", ignorenulls=True).over(w), 6).alias("locf_value"),
    )


_LTTB_BUCKET_US = 7 * 86_400 * 1_000_000  # weekly buckets, microseconds

_LTTB_ORACLE = f"""
WITH pts AS (
    SELECT user_id, ts, event_id, value,
           epoch_us(ts) AS x,
           epoch_us(ts) // {_LTTB_BUCKET_US} AS bkt
    FROM events
), baggs AS (
    SELECT user_id, bkt,
           SUM(x) AS sx, {dsum_sql("value")} AS sy, COUNT(*) AS n
    FROM pts GROUP BY user_id, bkt
), ctx AS (
    SELECT user_id, bkt,
           LAG(sx)  OVER w / LAG(n)  OVER w AS xp,
           LAG(sy)  OVER w / LAG(n)  OVER w AS yp,
           LEAD(sx) OVER w / LEAD(n) OVER w AS xn,
           LEAD(sy) OVER w / LEAD(n) OVER w AS yn
    FROM baggs
    WINDOW w AS (PARTITION BY user_id ORDER BY bkt)
), scored AS (
    SELECT p.user_id, p.ts, p.event_id, p.value, p.bkt,
           abs((c.xp - c.xn) * (p.value - c.yp)
               - (c.xp - p.x) * (c.yn - c.yp)) AS area
    FROM pts p JOIN ctx c ON p.user_id = c.user_id AND p.bkt = c.bkt
    WHERE c.xp IS NOT NULL AND c.xn IS NOT NULL
)
SELECT user_id, bkt, ts, event_id, ROUND(value, 6) AS value
FROM scored
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY user_id, bkt ORDER BY area DESC, ts, event_id) = 1
"""


@query(
    "events_downsample_lttb",
    tags=("events", "timeseries", "downsample", "extension"),
    oracle=_LTTB_ORACLE,
)
def events_downsample_lttb(spark, sf_dir):
    """Largest-triangle-three-buckets downsampling (the standard
    visual-fidelity decimation for dashboards), distributed form: per
    (series, weekly bucket) pick the point maximizing the triangle area
    against the NEIGHBOR BUCKETS' centroids — the classic sequential
    LTTB's selected-point dependency is replaced by bucket averages, the
    standard parallel approximation. Exactness across engines: bucket
    centroids divide an exact integer-µs sum and a decimal value sum, so
    the per-point area math runs on bit-identical doubles; selection is
    fully tie-broken (area DESC, ts, event_id). Shape: one bucket
    aggregation + lag/lead + one windowed top-1 — all linear, partitioned
    by series."""
    ev = table(spark, sf_dir, "events")
    # ts may read as TIMESTAMP_NTZ; session TZ is UTC so the cast to
    # TIMESTAMP is value-identical and unix_micros accepts it
    ep = F.unix_micros(F.col("ts").cast("timestamp"))
    pts = ev.select(
        "user_id", "ts", "event_id", "value",
        ep.alias("x"),
        (ep / F.lit(_LTTB_BUCKET_US)).cast("bigint").alias("bkt"),
    )
    baggs = pts.groupBy("user_id", "bkt").agg(
        F.sum("x").alias("sx"), dsum("value").alias("sy"),
        F.count(F.lit(1)).alias("n"),
    )
    w = Window.partitionBy("user_id").orderBy("bkt")
    ctx = baggs.select(
        "user_id", "bkt",
        (F.lag("sx").over(w) / F.lag("n").over(w)).alias("xp"),
        (F.lag("sy").over(w) / F.lag("n").over(w)).alias("yp"),
        (F.lead("sx").over(w) / F.lead("n").over(w)).alias("xn"),
        (F.lead("sy").over(w) / F.lead("n").over(w)).alias("yn"),
    )
    scored = (
        pts.join(ctx, ["user_id", "bkt"])
        .filter(F.col("xp").isNotNull() & F.col("xn").isNotNull())
        .withColumn(
            "area",
            F.abs(
                (F.col("xp") - F.col("xn")) * (F.col("value") - F.col("yp"))
                - (F.col("xp") - F.col("x")) * (F.col("yn") - F.col("yp"))
            ),
        )
    )
    sel = Window.partitionBy("user_id", "bkt").orderBy(
        F.desc("area"), F.asc("ts"), F.asc("event_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(sel))
        .filter(F.col("_rn") == 1)
        .select("user_id", "bkt", "ts", "event_id", F.round("value", 6).alias("value"))
    )


# Robust outlier detection (median / MAD — the Hampel filter): the
# standard data-cleaning gate for sensor/metric streams, immune to the
# outliers that wreck mean/stddev z-scores. Engine-exactness needs no
# rounding anywhere: values are scaled to integer cents, and the 0.5
# quantile over integers interpolates to exact binary halves in both
# engines (the agg_percentiles_exact precedent), so every downstream
# |v - med|, 3·MAD product and comparison is exact IEEE arithmetic.
# Exact per-group percentile materializes the group's value multiset —
# the 100 TB form swaps in approx_percentile for the thresholds (grouping
# key is bounded: event types); this is the oracle-checkable exact twin.
_MAD_ORACLE = """
WITH e AS (
    SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS v_c FROM events
), med AS (
    SELECT event_type, quantile_cont(v_c, 0.5) AS med_c FROM e GROUP BY 1
), dev AS (
    SELECT e.event_type, v_c, med_c, ABS(v_c - med_c) AS dev
    FROM e JOIN med USING (event_type)
), mad AS (
    SELECT event_type, quantile_cont(dev, 0.5) AS mad_c FROM dev GROUP BY 1
)
SELECT dev.event_type,
       COUNT(*) AS n_events,
       MIN(med_c) / 100 AS med,
       MIN(mad_c) / 100 AS mad,
       CAST(SUM(CASE WHEN dev > 3 * mad_c THEN 1 ELSE 0 END) AS BIGINT)
           AS n_outliers
FROM dev JOIN mad USING (event_type)
GROUP BY dev.event_type
"""


@query(
    "events_outlier_mad",
    tags=("events", "quality", "outlier", "extension"),
    oracle=_MAD_ORACLE,
)
def events_outlier_mad(spark, sf_dir):
    """Median/MAD (Hampel) outlier census per event type: two grouped
    exact-percentile passes + two broadcast joins on the bounded
    event-type key — flag |v - median| > 3·MAD. All comparisons are
    exact (integer cents, dyadic quantile), so the outlier count is
    bit-reproducible under any partitioning."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v_c"),
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(v_c, 0.5D)").alias("med_c")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med_c",
        F.abs(F.col("v_c") - F.col("med_c")).alias("dev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(dev, 0.5D)").alias("mad_c")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.min("med_c") / 100).alias("med"),
            (F.min("mad_c") / 100).alias("mad"),
            F.sum(
                F.when(F.col("dev") > 3 * F.col("mad_c"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )


# SCD Type-2 dimension build — the warehouse-standard "versioned
# attribute history" derivation every CDC pipeline materializes: one row
# per (entity, attribute-run), valid_from/valid_to from the change
# stream, open-ended current row. Two windows over the same
# (entity, time) partitioning: a lag() to detect attribute CHANGES (raw
# events repeat attributes; SCD2 versions only transitions) and a lead()
# over the surviving change rows for the validity interval. Shuffles
# once on user_id (the second window reuses the partitioning);
# per-partition sort is bounded by per-entity event counts. Fully
# tie-broken by (ts, event_id).
_SCD2_ORACLE = """
WITH chg AS (
    SELECT user_id, event_type, ts, event_id
    FROM (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events
    ) t
    WHERE prev IS DISTINCT FROM event_type
)
SELECT user_id, event_type AS attr, ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           AS is_current
FROM chg
"""


@query(
    "events_scd2_versions",
    tags=("events", "cdc", "scd2", "extension"),
    oracle=_SCD2_ORACLE,
)
def events_scd2_versions(spark, sf_dir):
    """SCD Type-2 version table from the event stream: lag() change
    detection, lead() validity intervals, NULL-open current rows."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(
            F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
        )
        .drop("prev")
    )
    return chg.select(
        "user_id",
        F.col("event_type").alias("attr"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


# Time-based sliding-window features (RANGE frames) — the
# feature-engineering staple ("activity in the trailing hour") and the
# one frame type the ROWS-frame queries above don't cover. Both engines
# order by integer epoch-microseconds so the RANGE bound is pure integer
# arithmetic; the sliding SUM goes through DECIMAL because the engines
# disagree on evaluation order inside moving frames (Spark re-scans the
# frame, DuckDB uses segment trees — double summation would differ
# beyond rounding). COUNT/MAX are order-free. The trailing ROWS-frame
# average rides along for the rows-vs-range contrast.
_ROLLING_ORACLE = """
SELECT event_id, user_id,
       COUNT(*) OVER w_1h AS cnt_1h,
       CAST(SUM(CAST(value AS DECIMAL(18,8))) OVER w_1h AS DOUBLE)
           AS sum_1h,
       MAX(value) OVER w_1h AS max_1h,
       CAST(SUM(CAST(value AS DECIMAL(18,8))) OVER w_10
            AS DOUBLE) / COUNT(*) OVER w_10 AS avg_last10
FROM events
WINDOW
  w_1h AS (PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW),
  w_10 AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
"""


@query(
    "events_rolling_features",
    tags=("events", "window", "range-frame", "features", "extension"),
    oracle=_ROLLING_ORACLE,
)
def events_rolling_features(spark, sf_dir):
    """Rolling ML features per user: trailing-1-hour RANGE frame
    (count/decimal-exact sum/max over event-time microseconds) and a
    trailing-10-event ROWS frame average. One shuffle on user_id shared
    by both frames; per-partition sorts bounded by per-user volume."""
    # ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP — the session
    # timezone is pinned to UTC, so the cast changes type, not wall time.
    ev = table(spark, sf_dir, "events").withColumn(
        "_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    # RANGE frames take a single ORDER column (and need no tiebreak:
    # value peers are all inside the frame by definition); the ROWS
    # frame needs the total order.
    w_1h = (
        Window.partitionBy("user_id")
        .orderBy("_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    w_10 = (
        Window.partitionBy("user_id")
        .orderBy("_us", "event_id")
        .rowsBetween(-9, 0)
    )
    dsum_1h = (
        F.sum(F.col("value").cast("decimal(18,8)")).over(w_1h).cast("double")
    )
    dsum_10 = (
        F.sum(F.col("value").cast("decimal(18,8)")).over(w_10).cast("double")
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w_1h).alias("cnt_1h"),
        dsum_1h.alias("sum_1h"),
        F.max("value").over(w_1h).alias("max_1h"),
        (dsum_10 / F.count(F.lit(1)).over(w_10)).alias("avg_last10"),
    )


# Malformed-record salvage — the PERMISSIVE-parse contract every ingest
# pipeline needs: corrupt records become NULLs to count and quarantine,
# never job failures. Corruption is synthesized deterministically (every
# 7th event's JSON loses its closing brace) so both engines see the
# identical dirty column; Spark's get_json_object returns NULL on
# malformed input, DuckDB errors — the oracle guards with json_valid,
# which is exactly Spark's implicit semantics.
_MALFORMED_ORACLE = """
WITH dirty AS (
    SELECT event_type,
           CASE WHEN event_id % 7 = 0
                THEN substr(props, 1, length(props) - 1)
                ELSE props END AS p
    FROM events
)
SELECT event_type,
       COUNT(*) AS cnt,
       CAST(SUM(CASE WHEN json_valid(p) THEN 0 ELSE 1 END) AS BIGINT)
           AS n_corrupt,
       CAST(SUM(CASE WHEN json_valid(p)
                     THEN CAST(json_extract_string(p, '$.k') AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS k_sum_salvaged
FROM dirty
GROUP BY event_type
"""


@query(
    "events_malformed_json_salvage",
    tags=("events", "json", "robustness", "extension"),
    oracle=_MALFORMED_ORACLE,
)
def events_malformed_json_salvage(spark, sf_dir):
    """PERMISSIVE ingest over a dirty JSON column: corrupt rows are
    counted and excluded; the salvaged aggregate covers the valid
    remainder. Pure projection + one hash agg.

    Corruption is detected EXPLICITLY — ``get_json_object(p, '$')`` is
    NULL iff the document fails to parse (verified against the whole
    truth table: valid objects, scalars, arrays, and JSON ``null`` all
    return non-NULL) — which is exactly DuckDB's ``json_valid``. A
    missing/NULL/non-integer ``k`` in a VALID document therefore does
    NOT count as corrupt in either engine; the previous k-is-NULL
    heuristic only agreed with the oracle by generator accident."""
    ev = table(spark, sf_dir, "events")
    p = F.when(
        F.col("event_id") % 7 == 0,
        F.expr("substr(props, 1, length(props) - 1)"),
    ).otherwise(F.col("props"))
    valid = F.get_json_object(p, "$").isNotNull()
    # Inside a valid doc, the oracle hard-CASTs k; under ANSI both
    # engines error identically on a non-integer k, so plain cast keeps
    # the semantics symmetric rather than masking with try_cast.
    k = F.when(valid, F.get_json_object(p, "$.k")).cast("bigint")
    return (
        ev.select("event_type", valid.alias("valid"), k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.when(F.col("valid"), 0).otherwise(1))
            .cast("bigint")
            .alias("n_corrupt"),
            F.sum(F.coalesce(F.col("k"), F.lit(0))).cast("bigint").alias(
                "k_sum_salvaged"
            ),
        )
    )


_INTERP_ORACLE = f"""
WITH hourly AS (
    SELECT date_trunc('hour', ts) AS hr, event_type,
           {dsum_sql("value")} AS value_sum
    FROM events GROUP BY 1, 2
), b AS (
    SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM hourly
), grid AS (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr, et.event_type
    FROM b, (SELECT DISTINCT event_type FROM events) et
), j AS (
    SELECT g.hr, g.event_type, h.value_sum,
           epoch_us(g.hr) // 1000000 AS hr_s
    FROM grid g LEFT JOIN hourly h ON g.hr = h.hr AND g.event_type = h.event_type
), ctx AS (
    SELECT hr, event_type, value_sum, hr_s,
           LAST_VALUE(value_sum IGNORE NULLS) OVER wp AS pv,
           LAST_VALUE(CASE WHEN value_sum IS NOT NULL THEN hr_s END IGNORE NULLS)
               OVER wp AS pt,
           FIRST_VALUE(value_sum IGNORE NULLS) OVER wn AS nv,
           FIRST_VALUE(CASE WHEN value_sum IS NOT NULL THEN hr_s END IGNORE NULLS)
               OVER wn AS nt
    FROM j
    WINDOW
      wp AS (PARTITION BY event_type ORDER BY hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      wn AS (PARTITION BY event_type ORDER BY hr
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, hr,
       (value_sum IS NOT NULL) AS is_observed,
       ROUND(CASE
           WHEN value_sum IS NOT NULL THEN value_sum
           WHEN pv IS NULL OR nv IS NULL THEN NULL
           ELSE pv + (nv - pv) * ((hr_s - pt) / (nt - pt))
       END, 6) AS interp_value
FROM ctx
"""


@query(
    "ts_interpolate_linear",
    tags=("events", "gapfill", "interpolate", "hypertable", "extension"),
    oracle=_INTERP_ORACLE,
)
def ts_interpolate_linear(spark, sf_dir):
    """Time-bucket gap filling with LINEAR interpolation — the
    hypertable `interpolate()` sibling of `adhoc_gapfill_locf`: build
    the hourly grid per event type, then fill each gap hour with the
    value on the straight line between the last observation before it
    and the first one after it (boundary gaps stay NULL — there is no
    second anchor to draw the line through). The anchors come from two
    ignore-nulls running windows (backward last + forward first), so the
    fill is two linear passes over the grid — whose size is hours ×
    types, bounded by the time span, not the event volume, at any scale.
    Cross-engine exactness: both anchors are identical doubles, the gap
    fraction is a bigint-seconds ratio (IEEE division, bit-identical),
    and the result rounds to 6 decimals per the repo convention."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hr"), "event_type"
    ).agg(dsum("value").alias("value_sum"))
    bounds = hourly.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    hours = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hr")
    )
    grid = hours.crossJoin(F.broadcast(ev.select("event_type").distinct()))
    j = grid.join(hourly, ["hr", "event_type"], "left").withColumn(
        "hr_s", F.unix_timestamp("hr")
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hr = F.when(F.col("value_sum").isNotNull(), F.col("hr_s"))
    pv = F.last("value_sum", ignorenulls=True).over(wp)
    pt = F.last(obs_hr, ignorenulls=True).over(wp)
    nv = F.first("value_sum", ignorenulls=True).over(wn)
    nt = F.first(obs_hr, ignorenulls=True).over(wn)
    interp = (
        F.when(F.col("value_sum").isNotNull(), F.col("value_sum"))
        .when(pv.isNull() | nv.isNull(), F.lit(None))
        .otherwise(pv + (nv - pv) * ((F.col("hr_s") - pt) / (nt - pt)))
    )
    return j.select(
        "event_type",
        "hr",
        F.col("value_sum").isNotNull().alias("is_observed"),
        F.round(interp, 6).alias("interp_value"),
    )


_OHLC_ORACLE = """
WITH k AS (
    SELECT event_type, date_trunc('hour', ts) AS hr, value,
           lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
               || lpad(CAST(event_id AS VARCHAR), 20, '0') AS ord
    FROM events
)
SELECT event_type, hr,
       arg_min(value, ord) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       arg_max(value, ord) AS close,
       COUNT(*) AS n_events
FROM k GROUP BY event_type, hr
"""


@query(
    "ts_resample_ohlc",
    tags=("events", "resample", "ohlc", "hypertable", "extension"),
    oracle=_OHLC_ORACLE,
)
def ts_resample_ohlc(spark, sf_dir):
    """Hourly OHLC downsampling (open/high/low/close — the hypertable
    candlestick resample): ONE map-side-combined hash aggregate, no
    window sort anywhere. open/close use min_by/max_by over a
    zero-padded (epoch-micros, event_id) string key — lexicographic
    order equals chronological order, the key is unique (event_id
    breaks microsecond ties identically in both engines), and arg-min
    aggregates combine associatively, so the plan is partial-agg →
    exchange-on-(type,hour) → final-agg at any scale. Values are raw
    row doubles or min/max — nothing is computed, so no rounding is
    needed anywhere."""
    ev = table(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ; the UTC-session cast to TIMESTAMP is
    # value-identical and unix_micros accepts it (same as the LTTB x)
    ord_key = F.concat(
        F.lpad(F.unix_micros(F.col("ts").cast("timestamp")).cast("string"), 20, "0"),
        # 20 covers any BIGINT (19 digits) — lpad TRUNCATES when the
        # value outgrows the pad, which would silently corrupt the
        # open/close ordering (r7 advice)
        F.lpad(F.col("event_id").cast("string"), 20, "0"),
    )
    return (
        ev.select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("hr"),
            "value",
            ord_key.alias("ord"),
        )
        .groupBy("event_type", "hr")
        .agg(
            F.expr("min_by(value, ord)").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.expr("max_by(value, ord)").alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# Lag-k autocorrelation of the hourly series, k = 1 (hour-over-hour
# persistence) and 24 (daily seasonality). Pearson r over (v_t, v_{t-k})
# pairs in the algebraic five-sum form, every sum decimal-exact (the
# dsum discipline — products of identical doubles are identical, so
# their decimal casts sum order-free), and the final r is arithmetic on
# identical doubles (sqrt is correctly-rounded IEEE). The series is the
# per-(type, hour) aggregate, so the windows and sums run over a frame
# bounded by time span x types — never event volume. A zero-variance
# side yields NULL via an explicit guard (identical in both engines,
# instead of an engine-specific inf/NaN).
_AUTOCORR_ORACLE = f"""
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS hr,
           {dsum_sql("value")} AS v
    FROM events GROUP BY 1, 2
), lagged AS (
    SELECT event_type, v,
           LAG(v, 1)  OVER w AS l1,
           LAG(v, 24) OVER w AS l24
    FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY hr)
), stats AS (
    SELECT event_type, 1 AS lag_hours,
           COUNT(*) AS n_pairs,
           {dsum_sql("v")} AS sx, {dsum_sql("l1")} AS sy,
           {dsum_sql("v * v")} AS sxx, {dsum_sql("l1 * l1")} AS syy,
           {dsum_sql("v * l1")} AS sxy
    FROM lagged WHERE l1 IS NOT NULL GROUP BY event_type
    UNION ALL
    SELECT event_type, 24,
           COUNT(*),
           {dsum_sql("v")}, {dsum_sql("l24")},
           {dsum_sql("v * v")}, {dsum_sql("l24 * l24")},
           {dsum_sql("v * l24")}
    FROM lagged WHERE l24 IS NOT NULL GROUP BY event_type
)
SELECT event_type, lag_hours, n_pairs,
       ROUND(CASE
           WHEN (n_pairs * sxx - sx * sx) > 0 AND (n_pairs * syy - sy * sy) > 0
           THEN (n_pairs * sxy - sx * sy)
                / sqrt((n_pairs * sxx - sx * sx) * (n_pairs * syy - sy * sy))
       END, 6) AS autocorr
FROM stats
"""


@query(
    "ts_autocorr",
    tags=("events", "autocorr", "seasonality", "extension"),
    oracle=_AUTOCORR_ORACLE,
)
def ts_autocorr(spark, sf_dir):
    """Lag-1 and lag-24 autocorrelation of the hourly value series per
    event type — the seasonality probe a metrics pipeline runs before
    choosing window sizes. See the block comment for the exactness and
    scale shape (everything past the first aggregate is bounded by time
    span x types)."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(dsum("value").alias("v"))
    w = Window.partitionBy("event_type").orderBy("hr")
    lagged = hourly.select(
        "event_type",
        "v",
        F.lag("v", 1).over(w).alias("l1"),
        F.lag("v", 24).over(w).alias("l24"),
    )

    def branch(lcol: str, k: int):
        return (
            lagged.filter(F.col(lcol).isNotNull())
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                dsum("v").alias("sx"),
                dsum(lcol).alias("sy"),
                dsum(F.col("v") * F.col("v")).alias("sxx"),
                dsum(F.col(lcol) * F.col(lcol)).alias("syy"),
                dsum(F.col("v") * F.col(lcol)).alias("sxy"),
            )
            .withColumn("lag_hours", F.lit(k))
        )

    stats = branch("l1", 1).unionByName(branch("l24", 24))
    n = F.col("n_pairs")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    r = F.when(
        (varx > 0) & (vary > 0),
        (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(varx * vary),
    )
    return stats.select(
        "event_type", "lag_hours", "n_pairs", F.round(r, 6).alias("autocorr")
    )
