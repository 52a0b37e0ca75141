"""Subquery family (SURVEY.md §2.3 scalar-subquery rows).

Covers: uncorrelated scalar subquery (q32/q92 `> (select avg(...)*1.2)`),
correlated scalar subquery (q1's per-store average — Catalyst decorrelates
these into an aggregate + join, which is exactly how we express it in the
DataFrame API), and IN-subqueries (q95's IN over a CTE).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lhbench_spark.catalog import table
from lhbench_spark.functions.numeric import davg_sql, dsum, dsum_sql
from lhbench_spark.queries.registry import query


@query(
    "subq_scalar_uncorrelated",
    tags=("subquery", "scalar"),
    oracle=f"""
SELECT p_partkey, p_name, p_retailprice
FROM part
WHERE p_retailprice > 1.005 * (
    SELECT {davg_sql("p_retailprice")} FROM part
)
""",
)
def subq_scalar_uncorrelated(spark, sf_dir):
    """Uncorrelated scalar subquery (q32/q92 shape). Spark-first: the
    scalar aggregate is computed once and broadcast into the filter via a
    cross-join of a 1-row DataFrame — the same plan Catalyst builds for
    the SQL form. Decimal-exact avg keeps the threshold engine-exact.
    The 1.005 multiplier is calibrated to the generator's narrow
    retail-price band (900-1000): q32's textbook 1.2x never fires there,
    and a 0 = 0 oracle match is not correctness evidence."""
    part = table(spark, sf_dir, "part")
    threshold = part.agg(
        (
            F.sum(F.col("p_retailprice").cast("decimal(18,8)")).cast("double")
            / F.count("p_retailprice")
            * 1.005
        ).alias("thr")
    )
    return (
        part.join(F.broadcast(threshold))
        .filter(F.col("p_retailprice") > F.col("thr"))
        .select("p_partkey", "p_name", "p_retailprice")
    )


@query(
    "subq_scalar_correlated",
    tags=("subquery", "scalar", "correlated"),
    oracle=f"""
SELECT s_suppkey, s_name, s_acctbal
FROM supplier s
WHERE s_acctbal > (
    SELECT {davg_sql("s2.s_acctbal")}
    FROM supplier s2
    WHERE s2.s_nationkey = s.s_nationkey
)
""",
)
def subq_scalar_correlated(spark, sf_dir):
    """Correlated scalar subquery — reference q1 (:37-39): rows above
    their group's average. Expressed as the decorrelated plan Catalyst
    would produce: per-nation aggregate joined back on the correlation
    key. At 100 TB the re-join shuffles once on the (low-cardinality)
    correlation key; the aggregate side is tiny and broadcasts."""
    supp = table(spark, sf_dir, "supplier")
    per_nation = supp.groupBy(F.col("s_nationkey").alias("nk")).agg(
        (
            F.sum(F.col("s_acctbal").cast("decimal(18,8)")).cast("double")
            / F.count("s_acctbal")
        ).alias("nation_avg")
    )
    return (
        supp.join(F.broadcast(per_nation), supp.s_nationkey == per_nation.nk)
        .filter(F.col("s_acctbal") > F.col("nation_avg"))
        .select("s_suppkey", "s_name", "s_acctbal")
    )


@query(
    "subq_in_list",
    tags=("subquery", "in"),
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_custkey IN (
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
)
AND o_orderstatus = 'F'
""",
)
def subq_in_list(spark, sf_dir):
    """IN-subquery (q95 shape) → left-semi join against the subquery."""
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    autos = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "AUTOMOBILE"
    )
    return orders.join(
        F.broadcast(autos), orders.o_custkey == autos.c_custkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")


_BEST_CUST_ORACLE = f"""
WITH freq_parts AS (
    SELECT l.l_partkey
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE year(o.o_orderdate) = 1996
    GROUP BY l.l_partkey
    HAVING COUNT(*) > 4
), spend AS (
    SELECT o_custkey, {dsum_sql("o_totalprice")} AS total
    FROM orders GROUP BY o_custkey
), best_customers AS (
    SELECT o_custkey FROM spend
    WHERE total > 0.5 * (SELECT MAX(total) FROM spend)
), channels AS (
    SELECT '1-URGENT' AS channel, l.l_extendedprice * (1 - l.l_discount) AS rev
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
      AND l.l_partkey IN (SELECT l_partkey FROM freq_parts)
      AND o.o_custkey IN (SELECT o_custkey FROM best_customers)
    UNION ALL
    SELECT '2-HIGH', l.l_extendedprice * (1 - l.l_discount)
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '2-HIGH'
      AND l.l_partkey IN (SELECT l_partkey FROM freq_parts)
      AND o.o_custkey IN (SELECT o_custkey FROM best_customers)
)
SELECT channel, COUNT(*) AS cnt, {dsum_sql("rev")} AS rev_sum
FROM channels GROUP BY channel
"""


@query(
    "complex_q23_best_customers",
    tags=("subquery", "cte", "union", "tpcds-shape"),
    oracle=_BEST_CUST_ORACLE,
)
def complex_q23_best_customers(spark, sf_dir):
    """q23a/b shape (TPCDSBenchmarkQueries.scala:1226-1276): two CTEs —
    frequent items (HAVING over a join) and best customers (spend above
    50% of the MAX spend, an uncorrelated scalar subquery) — each
    CONSUMED TWICE by a 2-channel UNION ALL that semi-joins both. The
    scalar max rides a 1-row broadcast (BroadcastNestedLoopJoin, never a
    CartesianProduct); the CTE sets gate the facts as left-semi joins,
    so fact rows never multiply."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    lo = li.join(o, li.l_orderkey == o.o_orderkey)
    freq_parts = (
        lo.filter(F.year("o_orderdate") == 1996)
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 4)
        .select("l_partkey")
    )
    spend = o.groupBy("o_custkey").agg(dsum("o_totalprice").alias("total"))
    max_spend = spend.agg(F.max("total").alias("_mx"))
    best = (
        spend.crossJoin(F.broadcast(max_spend))
        .filter(F.col("total") > 0.5 * F.col("_mx"))
        .select("o_custkey")
    )

    def channel(prio: str):
        return (
            lo.filter(F.col("o_orderpriority") == prio)
            .join(freq_parts, "l_partkey", "left_semi")
            .join(best, "o_custkey", "left_semi")
            .select(
                F.lit(prio).alias("channel"),
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
            )
        )

    return (
        channel("1-URGENT")
        .unionByName(channel("2-HIGH"))
        .groupBy("channel")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("rev").alias("rev_sum"))
    )
