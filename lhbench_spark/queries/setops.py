"""Set-operation family (SURVEY.md §2.7): UNION ALL, INTERSECT, EXCEPT.

The reference uses UNION ALL heavily (q2/q5/q14/q23/q33/... channel
unions), INTERSECT (q8/q14/q38 3-way) and EXCEPT (q87 double chain).
Spark plans INTERSECT/EXCEPT as left-semi/left-anti + distinct — the
same shuffle profile as the corresponding joins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lhbench_spark.catalog import table
from lhbench_spark.functions.numeric import dsum, dsum_sql
from lhbench_spark.queries.registry import query


@query(
    "setop_union_all_channels",
    tags=("setop", "union"),
    oracle=f"""
SELECT channel, o_orderstatus,
       COUNT(*) AS cnt, {dsum_sql("o_totalprice")} AS total
FROM (
    SELECT 'high_value' AS channel, o_orderstatus, o_totalprice
    FROM orders WHERE o_totalprice > 300000
    UNION ALL
    SELECT 'urgent' AS channel, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderpriority = '1-URGENT'
) channels
GROUP BY channel, o_orderstatus
""",
)
def setop_union_all_channels(spark, sf_dir):
    """UNION ALL of branded branches + reaggregation — reference q2/q77
    5-branch channel-union shape. unionByName avoids positional bugs."""
    orders = table(spark, sf_dir, "orders")
    high = orders.filter(F.col("o_totalprice") > 300000).select(
        F.lit("high_value").alias("channel"), "o_orderstatus", "o_totalprice"
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.lit("urgent").alias("channel"), "o_orderstatus", "o_totalprice"
    )
    return (
        high.unionByName(urgent)
        .groupBy("channel", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice").alias("total"))
    )


@query(
    "setop_intersect",
    tags=("setop", "intersect"),
    oracle="""
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
INTERSECT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
""",
)
def setop_intersect(spark, sf_dir):
    """INTERSECT — reference q8/q14/q38. Customers active in both 1996
    and 1997. Set semantics (deduplicated) on both engines."""
    orders = table(spark, sf_dir, "orders")
    y96 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_custkey")
    y97 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y96.intersect(y97)


@query(
    "setop_except",
    tags=("setop", "except"),
    oracle="""
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders
WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-02-01'
""",
)
def setop_except(spark, sf_dir):
    """EXCEPT — reference q87 double-EXCEPT chain. Customers minus the
    January-1995 buyers (the set-op twin of join_anti_not_exists; the
    date window keeps the difference NON-EMPTY at every SF, because
    every customer has some order by construction and 0 = 0 is not
    correctness evidence)."""
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    ordered = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1995-02-01")
        )
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.subtract(ordered)  # subtract == EXCEPT (distinct) semantics


# -- Unpivot (melt) --------------------------------------------------------
# Wide -> long reshaping via the `stack` generator (the reference's engines
# express this as UNION ALL — SURVEY §2.7; Spark fuses stack into the
# project, ONE scan instead of N). Per-row doubles are IEEE-exact across
# engines; the % 50 slice bounds output and pushes to the parquet scan.
_UNPIVOT_ORACLE = """
SELECT o_orderkey, 'custkey' AS metric, CAST(o_custkey AS DOUBLE) AS value
FROM orders WHERE o_orderkey % 50 = 0
UNION ALL
SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS value
FROM orders WHERE o_orderkey % 50 = 0
"""


@query("columnar_unpivot", tags=("setop", "unpivot"), oracle=_UNPIVOT_ORACLE)
def columnar_unpivot(spark, sf_dir):
    """UNPIVOT: one scan + generator, vs the oracle's two-scan UNION ALL —
    same rows, half the IO at scale."""
    orders = table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") % 50 == 0).selectExpr(
        "o_orderkey",
        "stack(2, 'custkey', CAST(o_custkey AS DOUBLE),"
        " 'totalprice', o_totalprice) AS (metric, value)",
    )


_EXCEPT_CHAIN_ORACLE = """
WITH urgent AS (
    SELECT DISTINCT o.o_custkey FROM orders o WHERE o.o_orderpriority = '1-URGENT'
), high AS (
    SELECT DISTINCT o.o_custkey FROM orders o WHERE o.o_orderpriority = '2-HIGH'
), low AS (
    SELECT DISTINCT o.o_custkey FROM orders o WHERE o.o_orderpriority = '5-LOW'
), survivors AS (
    SELECT o_custkey FROM urgent
    EXCEPT
    SELECT o_custkey FROM high
    EXCEPT
    SELECT o_custkey FROM low
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_custs,
       CAST(SUM(o_custkey) AS BIGINT) AS key_sum,
       CAST(MIN(o_custkey) AS BIGINT) AS min_key
FROM survivors
"""


@query(
    "columnar_except_chain",
    tags=("setop", "except", "tpcds-shape"),
    oracle=_EXCEPT_CHAIN_ORACLE,
)
def columnar_except_chain(spark, sf_dir):
    """q87's double-EXCEPT chain (TPCDSBenchmarkQueries.scala:4386-4406):
    customers ordering urgent EXCEPT those ordering high EXCEPT those
    ordering low — left-associative, so the second EXCEPT subtracts from
    the first chain's result, which Catalyst plans as stacked left-anti
    joins over distinct key sets (never a fact-sized shuffle of
    non-distinct rows). Bounded aggregate fingerprint output."""
    o = table(spark, sf_dir, "orders")

    def channel(prio: str):
        return (
            o.filter(F.col("o_orderpriority") == prio)
            .select("o_custkey")
            .distinct()
        )

    survivors = channel("1-URGENT").subtract(channel("2-HIGH")).subtract(
        channel("5-LOW")
    )
    return survivors.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_custs"),
        F.sum("o_custkey").cast("bigint").alias("key_sum"),
        F.min("o_custkey").cast("bigint").alias("min_key"),
    )
