"""Distributed as-of join (point-in-time lookup).

The reference has no as-of join (SURVEY.md §2.3 "Not present"); this is a
north-star extension: for every probe row, attach the most recent build
row with the same key whose timestamp is <= the probe timestamp — the
canonical feature-store / point-in-time-correctness lookup.

Spark has no ASOF JOIN primitive. A naive theta join
(``probe.join(build, key & (build.ts <= probe.ts))`` + max-per-probe)
explodes to O(|probe| x |matching build|) intermediate rows. The
scalable formulation used here is union + window:

1. union probe and build rows, tagged with a side bit;
2. hash-shuffle once on the join key, sort each partition by
   ``(ts, side)`` (build sorts before probe at equal ts so <= matches);
3. ``last(build_payload, ignorenulls=True)`` over a running ROWS frame
   carries the latest build values forward;
4. keep probe rows.

Cost: ONE shuffle of |probe| + |build| rows and one in-partition sort —
the same as a single sort-merge join, with no pairwise blowup, no skew
amplification beyond the key distribution itself (AQE skew handling
applies to the single exchange). At 100 TB this is the only shape that
survives: time-range bucketing can be layered on top by pre-partitioning
both sides on (key, time_bucket) without changing the window logic.

Determinism contract: the build side must be unique per (key, ts) —
callers pre-aggregate duplicates (e.g. ``max_by``) so the carried
payload does not depend on sort-tie order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_ts: str,
    build_ts: str,
    payload_cols: list[str],
    build_on: str | None = None,
) -> DataFrame:
    """Left as-of join: every probe row, plus the payload of the latest
    build row with ``build[build_on] == probe[on]`` and
    ``build_ts <= probe_ts`` (NULL payload when no build row precedes the
    probe). ``build_on`` defaults to ``on``.

    Returns all probe columns plus ``payload_cols`` and the matched
    build timestamp as ``asof_ts``.
    """
    probe_cols = probe.columns
    # Side bit: build=0 sorts before probe=1 at equal timestamps, making
    # the match inclusive (<=).
    b = build.select(
        F.col(build_on or on).alias("_k"),
        F.col(build_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in payload_cols],
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe_cols],
    ).withColumn("asof_ts", F.col("_t"))
    p = probe.select(
        F.col(on).alias("_k"),
        F.col(probe_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(build.schema[c].dataType).alias(c) for c in payload_cols],
        *[F.col(c) for c in probe_cols],
    ).withColumn("asof_ts", F.lit(None).cast(build.schema[build_ts].dataType))

    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = b.unionByName(p).select(
        *probe_cols,
        "_side",
        *[F.last(c, ignorenulls=True).over(w).alias(f"_c_{c}") for c in payload_cols],
        F.last("asof_ts", ignorenulls=True).over(w).alias("_c_asof_ts"),
    )
    return carried.filter(F.col("_side") == 1).select(
        *probe_cols,
        *[F.col(f"_c_{c}").alias(c) for c in payload_cols],
        F.col("_c_asof_ts").alias("asof_ts"),
    )


def asof_join_forward(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_ts: str,
    build_ts: str,
    payload_cols: list[str],
    build_on: str | None = None,
    tolerance_sec: int | None = None,
) -> DataFrame:
    """Left as-of join, FORWARD direction (pandas merge_asof
    direction='forward' parity): every probe row, plus the payload of the
    EARLIEST build row with matching key and ``build_ts >= probe_ts``.
    With ``tolerance_sec``, matches farther than the tolerance are nulled
    (pandas' tolerance semantics) — applied as a post-projection, so the
    plan is identical to the untolerated join.

    Same scale shape as the backward join: ONE shuffle of
    |probe| + |build| rows and an in-partition sort; the carried value is
    ``first(ignorenulls)`` over the (currentRow, unboundedFollowing)
    frame. Side bit reversed: probe sorts BEFORE build at equal ts so the
    >= match is inclusive."""
    probe_cols = probe.columns
    b = build.select(
        F.col(build_on or on).alias("_k"),
        F.col(build_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in payload_cols],
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe_cols],
    ).withColumn("asof_ts", F.col("_t"))
    p = probe.select(
        F.col(on).alias("_k"),
        F.col(probe_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(build.schema[c].dataType).alias(c) for c in payload_cols],
        *[F.col(c) for c in probe_cols],
    ).withColumn("asof_ts", F.lit(None).cast(build.schema[build_ts].dataType))

    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = b.unionByName(p).select(
        *probe_cols,
        "_side",
        F.col("_t").alias("_pt"),
        *[F.first(c, ignorenulls=True).over(w).alias(f"_c_{c}") for c in payload_cols],
        F.first("asof_ts", ignorenulls=True).over(w).alias("_c_asof_ts"),
    )
    rows = carried.filter(F.col("_side") == 0)
    if tolerance_sec is not None:
        # interval arithmetic, not epoch casts: the timestamps may be
        # TIMESTAMP_NTZ (parquet nanos read path), which Spark refuses to
        # cast to BIGINT
        within = F.col("_c_asof_ts") <= F.col("_pt") + F.expr(
            f"INTERVAL {int(tolerance_sec)} SECOND"
        )
        rows = rows.select(
            *probe_cols,
            *[
                F.when(within, F.col(f"_c_{c}")).alias(f"_c_{c}")
                for c in payload_cols
            ],
            F.when(within, F.col("_c_asof_ts")).alias("_c_asof_ts"),
        )
    return rows.select(
        *probe_cols,
        *[F.col(f"_c_{c}").alias(c) for c in payload_cols],
        F.col("_c_asof_ts").alias("asof_ts"),
    )
