"""Subquery family (SURVEY.md §2.3 scalar-subquery rows).

Covers: uncorrelated scalar subquery (q32/q92 `> (select avg(...)*1.2)`),
correlated scalar subquery (q1's per-store average — Catalyst decorrelates
these into an aggregate + join, which is exactly how we express it in the
DataFrame API), and IN-subqueries (q95's IN over a CTE).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lhbench_spark.catalog import table
from lhbench_spark.functions.numeric import davg_sql
from lhbench_spark.queries.registry import query


@query(
    "subq_scalar_uncorrelated",
    tags=("subquery", "scalar"),
    oracle=f"""
SELECT p_partkey, p_name, p_retailprice
FROM part
WHERE p_retailprice > 1.2 * (
    SELECT {davg_sql("p_retailprice")} FROM part
)
""",
)
def subq_scalar_uncorrelated(spark, sf_dir):
    """Uncorrelated scalar subquery (q32/q92 shape). Spark-first: the
    scalar aggregate is computed once and broadcast into the filter via a
    cross-join of a 1-row DataFrame — the same plan Catalyst builds for
    the SQL form. Decimal-exact avg keeps the threshold engine-exact."""
    part = table(spark, sf_dir, "part")
    threshold = part.agg(
        (
            F.sum(F.col("p_retailprice").cast("decimal(18,8)")).cast("double")
            / F.count("p_retailprice")
            * 1.2
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
