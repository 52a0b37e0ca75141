"""Window-function operator family (SURVEY.md §2.5).

Covers: rank over partitions (q36/q44/q47/q67/q70 shape), ratio-to-report
(q12/q20/q98), whole-partition avg (q47/q53/q63/q89), running totals and
running max with ROWS frames (q51), lag/lead (the idiomatic form of the
reference's rank+self-join emulation in q47/q57), row_number/dense_rank/
ntile, and a window over an aggregated child (q51's sum(sum(..)) over).

Scale notes: every window here partitions on a key whose cardinality grows
with the data (custkey, brand, month), so partitions stay small and the
sort inside each partition is bounded — no single-partition global window
(`Window.orderBy` without partitionBy) appears in any hot path.
Determinism: every ORDER BY inside a window is fully tie-broken.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lhbench_spark.catalog import table
from lhbench_spark.functions.numeric import dsum, dsum_sql
from lhbench_spark.queries.registry import query


@query(
    "win_rank_topn_per_group",
    tags=("window", "rank"),
    oracle="""
SELECT p_brand, p_partkey, p_retailprice, rnk
FROM (
    SELECT p_brand, p_partkey, p_retailprice,
           RANK() OVER (PARTITION BY p_brand
                        ORDER BY p_retailprice DESC, p_partkey) AS rnk
    FROM part
) ranked
WHERE rnk <= 3
""",
)
def win_rank_topn_per_group(spark, sf_dir):
    """rank() over partition — the reference's most common window
    (q36/q44/q67/q70/q86). Top-N per group via rank filter: one shuffle on
    the partition key, sort within partition, no global sort."""
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return (
        table(spark, sf_dir, "part")
        .withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rnk")
    )


@query(
    "win_ratio_to_report",
    tags=("window", "agg-over-agg"),
    oracle=f"""
SELECT r_name, n_name, nation_rev,
       ROUND(nation_rev * 100 / CAST(SUM(CAST(nation_rev AS DECIMAL(18,8)))
                                OVER (PARTITION BY r_name) AS DOUBLE), 9)
           AS rev_pct
FROM (
    SELECT r_name, n_name,
           {dsum_sql("l_extendedprice * (1 - l_discount)")} AS nation_rev
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
) per_nation
""",
)
def win_ratio_to_report(spark, sf_dir):
    """Ratio-to-report: window over an aggregated child — reference
    q12/q20/q98 `sum(x)*100/sum(sum(x)) over (partition by ...)`.
    The window input is already aggregated (25 rows/region-nation), so the
    window stage is negligible at any scale. nation_rev is decimal-exact
    → the double division is engine-exact."""
    li = table(spark, sf_dir, "lineitem")
    # supplier grows linearly with SF — no forced broadcast hint (AQE
    # re-broadcasts it at bench SFs; at 100 TB it becomes a shuffle join).
    # nation/region are fixed-cardinality (25/5 rows): hint is safe.
    supp = table(spark, sf_dir, "supplier")
    nat = F.broadcast(table(spark, sf_dir, "nation"))
    reg = F.broadcast(table(spark, sf_dir, "region"))
    per_nation = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("nation_rev"))
    )
    w = Window.partitionBy("r_name")
    region_rev = F.sum(F.col("nation_rev").cast("decimal(18,8)")).over(w).cast("double")
    return per_nation.select(
        "r_name",
        "n_name",
        "nation_rev",
        # ROUND(.., 9): r7's external gate (tpcds_q12) proved a
        # windowed-decimal-cast RATIO can differ in the last ulp under a
        # different DuckDB build — round before it recycles into the gate
        F.round(F.col("nation_rev") * 100 / region_rev, 9).alias("rev_pct"),
    )


@query(
    "win_avg_deviation",
    tags=("window",),
    oracle=f"""
SELECT p_brand, p_type, brand_type_rev, brand_avg
FROM (
    SELECT p_brand, p_type, brand_type_rev,
           ROUND(CAST(SUM(CAST(brand_type_rev AS DECIMAL(18,8)))
                      OVER (PARTITION BY p_brand) AS DOUBLE)
                 / COUNT(*) OVER (PARTITION BY p_brand), 6) AS brand_avg
    FROM (
        SELECT p_brand, p_type, {dsum_sql("l_extendedprice")} AS brand_type_rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_type
    ) bt
) t
WHERE brand_type_rev > brand_avg * 1.1
""",
)
def win_avg_deviation(spark, sf_dir):
    """Unordered window avg (whole-partition frame) + deviation filter —
    reference q53/q63/q89 shape. AVG over ≤6 rows per brand: the window
    operates on aggregated data; engine-exact inputs keep the filter
    boundary deterministic."""
    li = table(spark, sf_dir, "lineitem")
    # part is SF-scaled — no forced broadcast (AQE decides per actual size).
    part = table(spark, sf_dir, "part")
    bt = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(dsum("l_extendedprice").alias("brand_type_rev"))
    )
    w = Window.partitionBy("p_brand")
    brand_avg = (
        F.sum(F.col("brand_type_rev").cast("decimal(18,8)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    # ROUND(.., 6) BEFORE the deviation filter (same q12-class ulp
    # defense as rev_pct above; the oracle rounds in the same place)
    return bt.withColumn("brand_avg", F.round(brand_avg, 6)).filter(
        F.col("brand_type_rev") > F.col("brand_avg") * 1.1
    )


@query(
    "win_running_total",
    tags=("window", "frame"),
    oracle=f"""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,8))) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_spend,
       MAX(o_totalprice) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS running_max
FROM orders
WHERE o_custkey % 10 = 0
""",
)
def win_running_total(spark, sf_dir):
    """Running SUM + running MAX with an explicit ROWS frame — reference
    q51 (:2525-2552). Decimal accumulation keeps the running sum exact and
    order-stable; the frame ordering is tie-broken by orderkey. Evaluated
    over a deterministic 10% customer slice: per-row window output grows
    with the table, and a benchmark query must stay bounded (LIMIT-100
    discipline); the window mechanics are identical on the slice."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 10 == 0)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.sum(F.col("o_totalprice").cast("decimal(18,8)")).over(w).cast("double").alias("running_spend"),
            F.max("o_totalprice").over(w).alias("running_max"),
        )
    )


@query(
    "win_lag_lead_monthly",
    tags=("window", "lag"),
    oracle=f"""
SELECT month, rev,
       LAG(rev) OVER (ORDER BY month) AS prev_rev,
       LEAD(rev) OVER (ORDER BY month) AS next_rev
FROM (
    SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
           {dsum_sql("o_totalprice")} AS rev
    FROM orders GROUP BY 1
) monthly
""",
)
def win_lag_lead_monthly(spark, sf_dir):
    """lag/lead — the idiomatic PySpark form of the reference's
    rank+self-join lag emulation (q47 :2250-2262, q57). The global window
    is safe here because its input is one row per month (bounded);
    at 100 TB the pre-aggregation has already collapsed the data."""
    monthly = (
        table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month"))
        .agg(dsum("o_totalprice").alias("rev"))
    )
    w = Window.orderBy("month")
    return monthly.select(
        "month",
        "rev",
        F.lag("rev").over(w).alias("prev_rev"),
        F.lead("rev").over(w).alias("next_rev"),
    )


@query(
    "win_numbering",
    tags=("window", "rank"),
    oracle="""
SELECT o_orderpriority, o_orderkey,
       ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice DESC, o_orderkey) AS rn,
       DENSE_RANK() OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice DESC, o_orderkey) AS drnk,
       NTILE(4) OVER (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice DESC, o_orderkey) AS quartile
FROM orders
WHERE o_totalprice > 400000
""",
)
def win_numbering(spark, sf_dir):
    """row_number / dense_rank / ntile — not used by the reference's
    queries (SURVEY §2.5 notes their absence) but part of the complete
    window surface; included for coverage."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
    )


@query(
    "analytic_frames_ntile",
    tags=("window", "ntile", "frames"),
    oracle="""
SELECT o_orderpriority, tile,
       COUNT(*) AS cnt,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       MAX(drank) AS max_drank,
       MIN(fkey) AS first_key,
       MAX(cum_cnt) AS max_cumcnt
FROM (
    SELECT o_orderpriority, o_totalprice,
           NTILE(4) OVER w_uniq AS tile,
           DENSE_RANK() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice) AS drank,
           FIRST_VALUE(o_orderkey) OVER w_uniq AS fkey,
           COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                          RANGE BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_cnt
    FROM orders
    WINDOW w_uniq AS (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice, o_orderkey)
) t
GROUP BY o_orderpriority, tile
""",
)
def analytic_frames_ntile(spark, sf_dir):
    """The window variants SURVEY §2.5 lists as unused-but-available:
    ntile, dense_rank, first_value, and a RANGE frame (peers-inclusive
    running count). ntile/first_value use a fully tie-broken ordering
    (price, orderkey) so both engines agree; dense_rank and the RANGE
    frame order by price alone (both are tie-deterministic by
    definition). Bounded output: aggregated to (priority, tile)."""
    orders = table(spark, sf_dir, "orders")
    w_uniq = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    w_price = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    w_range = w_price.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        orders.select(
            "o_orderpriority",
            "o_totalprice",
            F.ntile(4).over(w_uniq).alias("tile"),
            F.dense_rank().over(w_price).alias("drank"),
            F.first("o_orderkey").over(w_uniq).alias("fkey"),
            F.count(F.lit(1)).over(w_range).alias("cum_cnt"),
        )
        .groupBy("o_orderpriority", "tile")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.max("drank").alias("max_drank"),
            F.min("fkey").alias("first_key"),
            F.max("cum_cnt").alias("max_cumcnt"),
        )
    )


# percent_rank/cume_dist are single-pass rank divisions — exact-integer
# numerator/denominator, one IEEE division, so the doubles are
# bit-identical across engines with no rounding needed. Window computed
# over the FULL partition, the % 100 slice applied after (bounded output).
_PCT_RANK_ORACLE = """
SELECT o_orderkey, o_orderpriority, o_totalprice, pct_rank, cume
FROM (
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           percent_rank() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice) AS pct_rank,
           cume_dist() OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice) AS cume
    FROM orders
) WHERE o_orderkey % 100 = 0
"""


@query("analytic_percent_rank", tags=("window", "rank"), oracle=_PCT_RANK_ORACLE)
def analytic_percent_rank(spark, sf_dir):
    """percent_rank + cume_dist per order priority — the distribution-
    position functions (SURVEY §2.5 family). Partition key cardinality is
    constant (5 priorities) but each partition is processed as a sorted
    stream, not materialized — scales with shuffle bandwidth."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return (
        orders.select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .filter(F.col("o_orderkey") % 100 == 0)
    )


# -- Rank over ROLLUP output (q70 shape) -----------------------------------
# TPC-DS q70 ranks states within each rollup grouping LEVEL: the window
# PARTITION BY contains grouping()-derived expressions computed by the
# aggregate below it (TPCDSBenchmarkQueries.scala:3582-3618). Spark
# supports grouping() in all three positions (select list, window
# partition, order) — this entry exercises the window-partition one.
_RANK_ROLLUP_ORACLE = f"""
WITH agg AS (
    SELECT r_name, n_name,
           {dsum_sql("c_acctbal")} AS total_bal,
           CAST(GROUPING(r_name) AS INT) + CAST(GROUPING(n_name) AS INT)
               AS lochierarchy
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
)
SELECT lochierarchy, r_name, n_name, total_bal,
       CAST(RANK() OVER (
           PARTITION BY lochierarchy,
                        CASE WHEN lochierarchy = 0 THEN r_name END
           ORDER BY total_bal DESC, n_name NULLS FIRST, r_name NULLS FIRST
       ) AS INT) AS rank_within_parent
FROM agg
"""


@query(
    "analytic_rank_over_rollup",
    tags=("window", "rollup", "grouping"),
    oracle=_RANK_ROLLUP_ORACLE,
)
def analytic_rank_over_rollup(spark, sf_dir):
    """rank() over the output of a ROLLUP aggregate, with the grouping
    level (and a level-conditional parent key) in the window PARTITION BY
    — the q70 idiom. The rollup's Expand feeds one hash aggregate; the
    window then shuffles only the aggregated (tiny) output. Fully
    tie-broken ordering keeps ranks deterministic cross-engine."""
    cust = table(spark, sf_dir, "customer")
    nat = F.broadcast(table(spark, sf_dir, "nation"))
    reg = F.broadcast(table(spark, sf_dir, "region"))
    joined = cust.join(nat, cust.c_nationkey == nat.n_nationkey).join(
        reg, nat.n_regionkey == reg.r_regionkey
    )
    agg = joined.rollup("r_name", "n_name").agg(
        dsum("c_acctbal").alias("total_bal"),
        (
            F.grouping("r_name").cast("int") + F.grouping("n_name").cast("int")
        ).alias("lochierarchy"),
    )
    w = Window.partitionBy(
        F.col("lochierarchy"),
        F.when(F.col("lochierarchy") == 0, F.col("r_name")),
    ).orderBy(
        F.desc("total_bal"),
        F.asc_nulls_first("n_name"),
        F.asc_nulls_first("r_name"),
    )
    return agg.select(
        "lochierarchy",
        "r_name",
        "n_name",
        "total_bal",
        F.rank().over(w).cast("int").alias("rank_within_parent"),
    )


# first_value / last_value / nth_value — the navigation-function corner of
# the window surface (the others: rank/lag/lead/ntile/percent_rank are
# covered above). Semantics trap: last_value over the DEFAULT frame
# (UNBOUNDED PRECEDING..CURRENT ROW) is just the current row — the whole
# point needs an explicit full-partition frame, which both engines spell
# identically. Per-row values only (no float aggregation), so the compare
# is exact without rounding.
_NAV_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS last_price,
       nth_value(o_totalprice, 2) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS second_price
FROM orders
WHERE o_custkey % 10 = 3
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@query(
    "analytic_first_last_nth",
    tags=("window", "navigation"),
    oracle=_NAV_ORACLE,
)
def analytic_first_last_nth(spark, sf_dir):
    """Navigation functions per customer order history: first order's
    price (default running frame), and last/second order's price over an
    explicit full-partition frame. Partition key cardinality grows with
    SF, so per-partition sorts stay bounded; the %10 slice bounds output,
    not computation shape."""
    orders = table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 3)
    running = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = running.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.first("o_totalprice").over(running).alias("first_price"),
        F.last("o_totalprice").over(full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(full).alias("second_price"),
    )
