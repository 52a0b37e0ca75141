"""Join operator family (SURVEY.md §2.3).

Covers: inner equi-join (N-way), left/full outer, semi (EXISTS), anti
(NOT EXISTS), theta residuals on equi-joins (interval predicates), and
broadcast strategy for dimension tables.

Scale notes: fact-fact joins (orders ⋈ lineitem) shuffle on the join key —
both sides are naturally keyed on orderkey so AQE keeps partitions sized.
Broadcast hints are placed ONLY on fixed-cardinality dims (nation=25,
region=5 at every SF). customer/supplier/part grow linearly with the
scale factor, so their join strategy is delegated to Catalyst/AQE: at
bench SFs they fall under autoBroadcastJoinThreshold and broadcast
anyway; at 100 TB they shuffle instead of OOMing executors — matching
the reference's stance of delegating strategy to the optimizer
(TPCDSBenchmark.scala:84-87).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lhbench_spark.catalog import table
from lhbench_spark.functions.numeric import dsum, dsum_sql
from lhbench_spark.queries.registry import query


@query(
    "join_shipping_priority",
    tags=("join", "topk", "flagship"),
    oracle=f"""
SELECT l_orderkey,
       {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def join_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape = reference q3's 3-way star join + group + top-k
    (TPCDSBenchmarkQueries.scala:104-123). customer's join strategy is
    left to AQE (it is SF-scaled; it broadcasts at bench SFs and shuffles
    at 100 TB); the orders⋈lineitem shuffle is the only unavoidable wide
    exchange. LIMIT is fully tie-broken (revenue DESC, l_orderkey) for
    deterministic top-k."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "join_local_supplier_volume",
    tags=("join", "groupby"),
    oracle=f"""
SELECT n_name,
       {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
)
def join_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join incl. a compound-key join
    (l_suppkey AND c_nationkey = s_nationkey — reference catalog_page
    compound join shape, TPCDSRefreshSchema.scala:784-785). nation/region
    (fixed-cardinality) broadcast; customer/supplier strategy delegated
    to AQE; one fact-fact shuffle."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nat = F.broadcast(table(spark, sf_dir, "nation"))
    reg = F.broadcast(table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "join_left_outer",
    tags=("join", "outer"),
    oracle=f"""
SELECT c_custkey,
       COUNT(o_orderkey) AS order_cnt,
       COALESCE({dsum_sql("o_totalprice")}, 0.0) AS total_spend
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""",
)
def join_left_outer(spark, sf_dir):
    """LEFT OUTER JOIN — reference q93/q72 + refresh-view 7-way left-outer
    chains (TPCDSRefreshSchema.scala:604-610). COUNT(col) ignores the
    nulls outer rows produce; COALESCE normalizes the null sum."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("order_cnt"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total_spend"),
        )
    )


@query(
    "join_full_outer",
    tags=("join", "outer"),
    oracle="""
WITH negcust AS (
    SELECT c_nationkey AS nk, COUNT(*) AS cust_cnt
    FROM customer WHERE c_acctbal < 0 GROUP BY c_nationkey
), richsupp AS (
    SELECT s_nationkey AS nk, COUNT(*) AS supp_cnt
    FROM supplier WHERE s_acctbal > 5000 GROUP BY s_nationkey
)
SELECT COALESCE(negcust.nk, richsupp.nk) AS nationkey,
       COALESCE(cust_cnt, 0) AS cust_cnt,
       COALESCE(supp_cnt, 0) AS supp_cnt
FROM negcust FULL OUTER JOIN richsupp ON negcust.nk = richsupp.nk
""",
)
def join_full_outer(spark, sf_dir):
    """FULL OUTER JOIN — reference q51/q97 shape (:4718): two aggregated
    branches stitched with full-outer + COALESCE'd keys."""
    negcust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .groupBy(F.col("c_nationkey").alias("cnk"))
        .agg(F.count(F.lit(1)).alias("cust_cnt"))
    )
    richsupp = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("snk"))
        .agg(F.count(F.lit(1)).alias("supp_cnt"))
    )
    return negcust.join(
        richsupp, negcust.cnk == richsupp.snk, "full_outer"
    ).select(
        F.coalesce("cnk", "snk").alias("nationkey"),
        F.coalesce("cust_cnt", F.lit(0)).alias("cust_cnt"),
        F.coalesce("supp_cnt", F.lit(0)).alias("supp_cnt"),
    )


@query(
    "join_semi_exists",
    tags=("join", "semi"),
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
""",
)
def join_semi_exists(spark, sf_dir):
    """Semi-join via EXISTS — reference q10/q95. Catalyst rewrites EXISTS
    to LeftSemi; we express it directly as a left_semi join (same plan,
    no duplicate-elimination cost of a plain join+distinct)."""
    cust = table(spark, sf_dir, "customer")
    urgent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti_not_exists",
    tags=("join", "anti"),
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= DATE '1995-01-01'
                  AND o_orderdate <  DATE '1995-02-01')
""",
)
def join_anti_not_exists(spark, sf_dir):
    """Anti-join via NOT EXISTS — reference q16/q94 shape (predicate
    inside the EXISTS, like q94's date window) → LeftAnti with the
    filter pushed to the build side. The window is the generator's first
    order month, so the result is NON-EMPTY at every SF — every customer
    has *some* order by construction, and a 0 = 0 oracle match cannot
    catch a wrong join."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1995-02-01")
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_mktsegment")


@query(
    "join_theta_interval",
    tags=("join", "theta"),
    oracle="""
SELECT o_orderpriority, COUNT(*) AS late_lines
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
             AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY o_orderpriority
""",
)
def join_theta_interval(spark, sf_dir):
    """Equi-join with a theta (interval) residual — reference q72 shape
    (`d3.d_date > d1.d_date + interval 5 days`, :3678). Catalyst keeps the
    equi key for the shuffle and evaluates the residual post-match, so
    this scales like a plain orderkey join."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAY")),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("late_lines"))
    )


@query(
    "join_skew_salted",
    tags=("join", "skew", "salting", "extension"),
    oracle="""
SELECT s_nationkey,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,8))) AS DOUBLE) AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
""",
)
def join_skew_salted(spark, sf_dir):
    """Skew-salted join (operators/skew.py): the top-5 hottest supplier
    keys are salted over 8 partitions (probe salt = hash of l_orderkey,
    build rows replicated per salt); cold keys join normally and the
    slices union. The oracle is the PLAIN join — salting must be
    result-invariant, which is exactly what the hash check proves."""
    from lhbench_spark.operators.skew import salted_join

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    hot = (
        li.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.desc("_n"), F.asc("l_suppkey"))
        .limit(5)
        .select("l_suppkey")
    )
    out = salted_join(
        li,
        sup,
        on="l_suppkey",
        build_on="s_suppkey",
        salts=8,
        salt_src="l_orderkey",
        hot_keys=hot,
    )
    return out.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("l_extendedprice").alias("revenue"),
    )


@query(
    "join_asof_last_event",
    tags=("join", "asof", "extension"),
    oracle="""
WITH ev AS (
    SELECT user_id, ts,
           MAX_BY(event_id, event_id) AS last_event_id,
           MAX_BY(event_type, event_id) AS last_event_type
    FROM events GROUP BY user_id, ts
)
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
       e.last_event_id, e.last_event_type, e.ts AS asof_ts
FROM (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
ASOF LEFT JOIN ev e
  ON o.o_custkey = e.user_id AND e.ts <= o.o_orderdate
""",
)
def join_asof_last_event(spark, sf_dir):
    """As-of join (point-in-time lookup): for each urgent order, the most
    recent event by the same user at or before the order date. Spark has
    no ASOF JOIN primitive — operators/asof.py implements it as
    union + one keyed shuffle + running `last(ignorenulls)` window (never
    the O(n*m) theta-join blowup); DuckDB's native ASOF LEFT JOIN is the
    oracle. Build side is pre-aggregated to one row per (user, ts) so the
    carried payload is tie-free in both engines."""
    from lhbench_spark.operators.asof import asof_join_backward

    ev = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(
            F.max_by("event_id", "event_id").alias("last_event_id"),
            F.max_by("event_type", "event_id").alias("last_event_type"),
        )
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    return asof_join_backward(
        orders,
        ev,
        on="o_custkey",
        build_on="user_id",
        probe_ts="o_orderdate",
        build_ts="ts",
        payload_cols=["last_event_id", "last_event_type"],
    )


@query(
    "join_asof_next_event",
    tags=("join", "asof", "forward", "tolerance", "extension"),
    oracle="""
WITH ev AS (
    SELECT user_id, ts,
           MAX_BY(event_id, event_id) AS next_event_id,
           MAX_BY(event_type, event_id) AS next_event_type
    FROM events GROUP BY user_id, ts
), j AS (
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
           e.next_event_id, e.next_event_type, e.ts AS matched_ts
    FROM (SELECT o_orderkey, o_custkey, o_orderdate
          FROM orders WHERE o_orderpriority = '2-HIGH') o
    ASOF LEFT JOIN ev e
      ON o.o_custkey = e.user_id AND e.ts >= o.o_orderdate
)
SELECT o_orderkey, o_custkey, o_orderdate,
       CASE WHEN matched_ts <= o_orderdate + INTERVAL 30 DAY
            THEN next_event_id END AS next_event_id,
       CASE WHEN matched_ts <= o_orderdate + INTERVAL 30 DAY
            THEN next_event_type END AS next_event_type,
       CASE WHEN matched_ts <= o_orderdate + INTERVAL 30 DAY
            THEN matched_ts END AS asof_ts
FROM j
""",
)
def join_asof_next_event(spark, sf_dir):
    """FORWARD as-of join with tolerance (pandas merge_asof
    direction='forward' parity — the 'what happened next within 30
    days?' lookup): for each high-priority order, the EARLIEST event by
    the same user at or after the order date, nulled when it is more
    than 30 days out. Same single-shuffle union+window plan as the
    backward as-of; DuckDB's native forward ASOF JOIN plus an interval
    gate is the oracle."""
    from lhbench_spark.operators.asof import asof_join_forward

    ev = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(
            F.max_by("event_id", "event_id").alias("next_event_id"),
            F.max_by("event_type", "event_id").alias("next_event_type"),
        )
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "2-HIGH"
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    return asof_join_forward(
        orders,
        ev,
        on="o_custkey",
        build_on="user_id",
        probe_ts="o_orderdate",
        build_ts="ts",
        payload_cols=["next_event_id", "next_event_type"],
        tolerance_sec=30 * 24 * 3600,
    )
