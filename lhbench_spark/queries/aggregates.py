"""Aggregation operator family (SURVEY.md §2.4).

Covers: hash GROUP BY, sum/avg/min/max/count, count(distinct), stddev_samp,
conditional aggregation (pivot idiom, reference q2/q9/q88 shape), GROUP BY
ROLLUP + grouping() (reference q5/q22/q67/q70 shape), HAVING (q6/q23 shape).

All Spark plans here are single-shuffle hash aggregates with map-side
partial aggregation (Catalyst does partial+final automatically); at 100 TB
these scale linearly as long as group-key cardinality per partition fits
memory — no collect, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lhbench_spark.catalog import table
from lhbench_spark.functions.numeric import davg, davg_sql, dsum, dsum_sql
from lhbench_spark.queries.registry import query


@query(
    "agg_pricing_summary",
    tags=("groupby", "filter", "flagship"),
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql("l_quantity")} AS sum_qty,
       {dsum_sql("l_extendedprice")} AS sum_base_price,
       {dsum_sql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
       {dsum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
       {davg_sql("l_quantity")} AS avg_qty,
       {davg_sql("l_extendedprice")} AS avg_price,
       {davg_sql("l_discount")} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
""",
)
def agg_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: wide scan → filter → hash agg. The reference's
    most common query shape (~90 of 103 TPC-DS queries are grouped aggs,
    SURVEY §2.4). Filter pushes to the parquet scan (through fan_out's
    repartition); agg is partial+final.

    fan_out: the 8 decimal-exact aggregates dominate this query's cost
    and run in the PARTIAL-agg stage, which for a single-row-group local
    scan is one task — one narrow shuffle buys 32-way partial aggregation
    (measured 1.9 s → 1.1 s at sf0.1) and is a no-op once the scan has
    core-count splits. Join-shaped queries deliberately do NOT do this:
    their map-side work is a cheap filter/project, so the extra pass
    costs more than it parallelizes."""
    from lhbench_spark.operators import fan_out

    li = fan_out(table(spark, sf_dir, "lineitem"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_count_distinct",
    tags=("groupby", "distinct"),
    oracle="""
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS uniq_custs,
       COUNT(*) AS order_cnt
FROM orders
GROUP BY o_orderpriority
""",
)
def agg_count_distinct(spark, sf_dir):
    """count(distinct) — reference q16/q28/q94/q95 shape. Catalyst plans
    multi-distinct via Expand; distinct-on-key shuffles once on
    (group, key) then re-aggregates — scales with distinct cardinality."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("uniq_custs"),
            F.count(F.lit(1)).alias("order_cnt"),
        )
    )


@query(
    "agg_stats",
    tags=("groupby", "stats"),
    oracle="""
SELECT l_returnflag,
       ROUND(STDDEV_SAMP(l_quantity), 4) AS std_qty,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty,
       COUNT(*) AS cnt
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_stats(spark, sf_dir):
    """stddev_samp — reference q17/q29/q39 coefficient-of-variation shape.
    Rounded to 4dp: stddev is the one aggregate where engines may differ in
    accumulation algorithm (Welford vs. naive); group sizes here make the
    relative error ≪ rounding granularity."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@query(
    "agg_conditional_pivot",
    tags=("groupby", "case"),
    oracle=f"""
SELECT l_returnflag,
       {dsum_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END")} AS qty_f,
       {dsum_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END")} AS qty_o,
       COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS discounted_cnt,
       COUNT(*) AS cnt
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_conditional_pivot(spark, sf_dir):
    """Conditional aggregation (manual pivot) — reference q2/q9/q88 8x8
    time-band shape. One pass, one shuffle, regardless of pivot width."""
    li = table(spark, sf_dir, "lineitem")
    qty_if = lambda status: dsum(  # noqa: E731
        F.when(F.col("l_linestatus") == status, F.col("l_quantity")).otherwise(0.0)
    )
    return li.groupBy("l_returnflag").agg(
        qty_if("F").alias("qty_f"),
        qty_if("O").alias("qty_o"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("discounted_cnt"),
        F.count(F.lit(1)).alias("cnt"),
    )


@query(
    "agg_rollup_grouping",
    tags=("rollup", "join"),
    oracle=f"""
SELECT r_name, n_name,
       COUNT(*) AS cust_cnt,
       {dsum_sql("c_acctbal")} AS total_bal,
       CAST(GROUPING(r_name) AS INT) AS g_region,
       CAST(GROUPING(n_name) AS INT) AS g_nation
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
""",
)
def agg_rollup_grouping(spark, sf_dir):
    """GROUP BY ROLLUP + grouping() — reference q5/q18/q22/q36/q67/q70/q86
    shape (8-col rollup in q67). Spark plans rollup via Expand (one row per
    grouping set) before the hash agg — a constant-factor expansion, still
    one shuffle. Dimension joins broadcast (nation/region are tiny)."""
    cust = table(spark, sf_dir, "customer")
    nat = F.broadcast(table(spark, sf_dir, "nation"))
    reg = F.broadcast(table(spark, sf_dir, "region"))
    joined = cust.join(nat, cust.c_nationkey == nat.n_nationkey).join(
        reg, nat.n_regionkey == reg.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("cust_cnt"),
        dsum("c_acctbal").alias("total_bal"),
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
    )


@query(
    "agg_having",
    tags=("groupby", "having"),
    oracle=f"""
SELECT l_suppkey,
       COUNT(*) AS item_cnt,
       {dsum_sql("l_quantity")} AS total_qty
FROM lineitem
GROUP BY l_suppkey
HAVING COUNT(*) >= 40
""",
)
def agg_having(spark, sf_dir):
    """HAVING — reference q6 (`having count(*) >= 10`) shape: post-agg
    filter, planned as Filter above HashAggregate (no extra shuffle)."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("item_cnt"),
            dsum("l_quantity").alias("total_qty"),
        )
        .filter(F.col("item_cnt") >= 40)
    )


@query(
    "agg_minmax_by_brand",
    tags=("groupby",),
    oracle="""
SELECT p_brand,
       MIN(p_retailprice) AS min_price,
       MAX(p_retailprice) AS max_price,
       COUNT(DISTINCT p_type) AS type_cnt
FROM part
GROUP BY p_brand
""",
)
def agg_minmax_by_brand(spark, sf_dir):
    """min/max need no decimal detour (order-independent already)."""
    return (
        table(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(
            F.min("p_retailprice").alias("min_price"),
            F.max("p_retailprice").alias("max_price"),
            F.countDistinct("p_type").alias("type_cnt"),
        )
    )


# Sketch aggregates: HLL++ ndv and a quantile sketch. A sketch result
# cannot be replayed bit-for-bit by another engine, so the CONTRACT is
# what the oracle checks: the exact value travels alongside booleans
# asserting the sketch landed inside its own error bound (deterministic
# for fixed input + sketch parameters — Spark's HLL++ and
# percentile_approx have no RNG). If a Spark upgrade degrades sketch
# accuracy past the bound, this gate fails.
_SKETCH_ORACLE = """
WITH s AS (SELECT COUNT(DISTINCT o_custkey) AS exact_ndv FROM orders),
p AS (
    SELECT quantile_disc(o_totalprice, 0.5) AS lo_med,
           quantile_cont(o_totalprice, 0.5) AS hi_med
    FROM orders
)
SELECT CAST(s.exact_ndv AS BIGINT) AS exact_ndv,
       TRUE AS ndv_within_5pct,
       TRUE AS p50_within_2pct
FROM s, p
"""


@query("agg_sketches", tags=("agg", "sketch", "approx"), oracle=_SKETCH_ORACLE)
def agg_sketches(spark, sf_dir):
    """approx_count_distinct (HLL++, rsd 2%; the 5% gate is then a ~2.5-sigma bound) and percentile_approx next
    to their exact twins — the sketch tier that replaces exact distinct
    counting at 100 TB (HLL state is KBs and merges map-side; exact
    count(distinct) is an Expand + full shuffle of the key column)."""
    from lhbench_spark.operators import fan_out

    # Sketch building is CPU-bound (HLL register updates + GK summary
    # inserts per row); parquet byte-sizing gives this table only a few
    # partitions, so rebalance to cluster parallelism first.
    o = fan_out(table(spark, sf_dir, "orders"))
    # Two single-row aggregates, not one: count(distinct) forces an Expand
    # over every row, and combining that with the object-buffer sketch
    # aggregates (HLL registers, percentile heaps) pushes the whole
    # aggregate onto the slow object/sort path — measured 12.6s fused vs
    # ~3s split at sf0.1. The crossJoin of two 1-row frames is free.
    ndv = o.agg(
        F.countDistinct("o_custkey").alias("exact_ndv"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_ndv"),
    )
    pct = o.agg(
        F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("approx_p50"),
        # Reference value for the tolerance check: the EXACT median. A
        # near-exact approx sketch (accuracy 1e6) was 20x more expensive
        # here — GK-summary merge cost grows with accuracy — and weaker.
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_p50"),
    )
    row = ndv.crossJoin(pct)
    return row.select(
        F.col("exact_ndv"),
        (
            F.abs(F.col("approx_ndv") - F.col("exact_ndv"))
            / F.col("exact_ndv")
            <= 0.05
        ).alias("ndv_within_5pct"),
        (
            F.abs(F.col("approx_p50") - F.col("exact_p50"))
            / F.col("exact_p50")
            <= 0.02
        ).alias("p50_within_2pct"),
    )


# -- Exact percentiles -----------------------------------------------------
# Exact (sort-based) quartiles complement the approx sketch in
# agg_sketches. Compare is hash-exact WITHOUT rounding because the inputs
# are integer-valued and the quantile fractions are dyadic (0.25/0.5/
# 0.75): lower + frac * (upper - lower) is exact IEEE arithmetic in both
# engines. Exact percentile materializes the per-group value multiset —
# the 100 TB path is the approx sketch; this is the bounded-cardinality
# exact check (grouping key: 3 return flags).
_PCTL_ORACLE = """
SELECT l_returnflag,
       COUNT(*) AS cnt,
       quantile_cont(l_quantity, 0.25) AS p25,
       quantile_cont(l_quantity, 0.50) AS p50,
       quantile_cont(l_quantity, 0.75) AS p75,
       MIN(l_quantity) AS qty_min,
       MAX(l_quantity) AS qty_max
FROM lineitem
GROUP BY l_returnflag
"""


@query("agg_percentiles_exact", tags=("agg", "percentile"), oracle=_PCTL_ORACLE)
def agg_percentiles_exact(spark, sf_dir):
    """Exact per-group quartiles of l_quantity (SURVEY §2.4 family,
    next to the HLL/KLL sketches in agg_sketches)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.percentile("l_quantity", F.lit(0.25)).alias("p25"),
        F.percentile("l_quantity", F.lit(0.50)).alias("p50"),
        F.percentile("l_quantity", F.lit(0.75)).alias("p75"),
        F.min("l_quantity").alias("qty_min"),
        F.max("l_quantity").alias("qty_max"),
    )


# -- Multi-distinct in one aggregate (q28 shape) ---------------------------
# TPC-DS q28 computes several COUNT(DISTINCT) over different predicate
# buckets of the same table in ONE query (TPCDSBenchmarkQueries.scala:
# 1529-1580). Catalyst plans this with a single Expand (one row copy per
# distinct group) feeding a shared hash aggregate — one scan, not one
# scan per bucket; the oracle computes the same conditional distincts.
_MULTI_DISTINCT_ORACLE = """
SELECT COUNT(DISTINCT CASE WHEN l_quantity <= 10 THEN l_extendedprice END) AS ndv_low,
       COUNT(DISTINCT CASE WHEN l_quantity > 10 AND l_quantity <= 30
                           THEN l_extendedprice END) AS ndv_mid,
       COUNT(DISTINCT CASE WHEN l_quantity > 30 THEN l_extendedprice END) AS ndv_high,
       COUNT(DISTINCT l_suppkey) AS ndv_supp,
       COUNT(*) AS cnt
FROM lineitem
"""


@query(
    "agg_multi_distinct_buckets",
    tags=("agg", "count-distinct", "expand"),
    oracle=_MULTI_DISTINCT_ORACLE,
)
def agg_multi_distinct_buckets(spark, sf_dir):
    """Several count(distinct) over different predicate buckets in one
    aggregate (the q28 idiom): Catalyst's Expand-based multi-distinct —
    one scan feeding all four distinct groups plus the plain count."""
    li = table(spark, sf_dir, "lineitem")
    low = F.when(F.col("l_quantity") <= 10, F.col("l_extendedprice"))
    mid = F.when(
        (F.col("l_quantity") > 10) & (F.col("l_quantity") <= 30),
        F.col("l_extendedprice"),
    )
    high = F.when(F.col("l_quantity") > 30, F.col("l_extendedprice"))
    return li.agg(
        F.countDistinct(low).alias("ndv_low"),
        F.countDistinct(mid).alias("ndv_mid"),
        F.countDistinct(high).alias("ndv_high"),
        F.countDistinct("l_suppkey").alias("ndv_supp"),
        F.count(F.lit(1)).alias("cnt"),
    )


# True .pivot() demo (RelationalGroupedDataset.pivot with an EXPLICIT
# value list — never inferred: inference costs a distinct-scan job and
# makes the output schema data-dependent, both wrong at scale).
_PIVOT_PRIOS = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


def _pivot_col(p: str) -> str:
    return "prio_" + p.split("-")[0]


_PIVOT_WIDE_ORACLE = f"""
SELECT o_orderstatus,
       {", ".join(
           f"COUNT(CASE WHEN o_orderpriority = '{p}' THEN 1 END)"
           f" AS {_pivot_col(p)}"
           for p in _PIVOT_PRIOS
       )}
FROM orders
GROUP BY o_orderstatus
"""


@query(
    "agg_pivot_wide",
    tags=("agg", "pivot", "wide"),
    oracle=_PIVOT_WIDE_ORACLE,
)
def agg_pivot_wide(spark, sf_dir):
    """groupBy().pivot() with an explicit value list — the wide-table
    form of the reference's conditional-agg idiom (q2/q88 shape,
    agg_conditional_pivot is the CASE-expression twin). Catalyst plans
    it as a single hash aggregate with one conditional count per pivot
    value: one shuffle on the group key, output width fixed at plan
    time."""
    o = table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", list(_PIVOT_PRIOS))
        .agg(F.count(F.lit(1)))
    )
    out = wide.select(
        "o_orderstatus",
        *[
            F.coalesce(F.col(f"`{p}`"), F.lit(0)).cast("bigint").alias(_pivot_col(p))
            for p in _PIVOT_PRIOS
        ],
    )
    return out
