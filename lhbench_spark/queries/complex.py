"""Optimizer-stress queries at the reference's hardest TPC-DS shapes.

Operator coverage alone does not stress Catalyst the way the reference's
giants do; these two reproduce their structure on the TPC-H-ish testdata:

- ``complex_q64_bigjoin`` — the q64 shape
  (TPCDSBenchmarkQueries.scala:3085-3204): a join-dense CTE (fact +
  7 dimensions) consumed TWICE — two passes over the fact at different
  parameter values — then self-joined on the item key, ~16 joins total.
- ``complex_q14_intersect_rollup`` — the q14a shape (:788-998): a 3-way
  INTERSECT defines the qualifying item set, which gates a fact
  aggregation under GROUP BY ROLLUP with grouping()-derived columns.

Scale shape: fixed-cardinality dims (nation, region) carry explicit
broadcast hints; SF-scaled dims (customer, supplier, part) are left to
Catalyst/AQE, which broadcasts them when they fit under
autoBroadcastJoinThreshold and falls back to a shuffled join when they
don't — a forced hint there would OOM executors at 100×. Each fact pass
is one shuffle (the group-by), and the CTE self-join / semi-join operate
on aggregated, item-sized frames — the plans a 1000-executor run needs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lhbench_spark.catalog import table
from lhbench_spark.functions.numeric import dsum, dsum_sql
from lhbench_spark.queries.registry import query

# Shared CTE semantics (Spark + DuckDB must agree exactly):
# per (partkey, brand, order-year), the ASIA-customer revenue of small
# parts — an 8-relation join tree before aggregation.
_CS_SQL = f"""
    SELECT p.p_partkey, p.p_brand, year(o.o_orderdate) AS yr,
           {dsum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS rev,
           COUNT(*) AS cnt
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
    JOIN region cr   ON cn.n_regionkey = cr.r_regionkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
    JOIN part p      ON l.l_partkey = p.p_partkey
    WHERE cr.r_name = 'ASIA' AND p.p_size <= 20
    GROUP BY p.p_partkey, p.p_brand, year(o.o_orderdate)
"""

_Q64_ORACLE = f"""
WITH cs AS ({_CS_SQL})
SELECT a.p_partkey, a.p_brand,
       a.rev AS rev_y1, b.rev AS rev_y2,
       a.cnt AS cnt_y1, b.cnt AS cnt_y2
FROM cs a JOIN cs b ON a.p_partkey = b.p_partkey
WHERE a.yr = 1996 AND b.yr = 1997 AND b.rev > a.rev
ORDER BY a.p_partkey
LIMIT 100
"""


def _cross_sales(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    s = table(spark, sf_dir, "supplier")
    p = table(spark, sf_dir, "part")
    cn = n.select(
        F.col("n_nationkey").alias("cn_nationkey"),
        F.col("n_regionkey").alias("cn_regionkey"),
    )
    sn = n.select(F.col("n_nationkey").alias("sn_nationkey"))
    # Broadcast hints only on fixed-cardinality dims (nation=25, region=5
    # at every SF). customer/supplier/part grow linearly with SF — a
    # forced hint there bypasses autoBroadcastJoinThreshold and OOMs
    # executors at the reference's 3 TB+; Catalyst/AQE picks broadcast
    # for them automatically whenever they actually fit.
    joined = (
        li.join(p.filter(F.col("p_size") <= 20), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_nationkey"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("cn_regionkey") == r.r_regionkey,
        )
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_nationkey"))
    )
    return joined.groupBy(
        "p_partkey", "p_brand", F.year("o_orderdate").alias("yr")
    ).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        F.count(F.lit(1)).alias("cnt"),
    )


@query(
    "complex_q64_bigjoin",
    tags=("complex", "join", "cte-reuse", "tpcds-shape"),
    oracle=_Q64_ORACLE,
)
def complex_q64_bigjoin(spark, sf_dir):
    """q64 shape (TPCDSBenchmarkQueries.scala:3085-3204): an 8-relation
    join CTE consumed twice (order-year 1996 vs 1997) and self-joined on
    the part key — ~16 joins and two fact passes in one plan. Every
    dimension broadcasts; each fact pass shuffles once (its group-by);
    the self-join runs on item-level aggregates, not fact rows. Bounded
    output: tie-broken top-100 by part key."""
    cs = _cross_sales(spark, sf_dir)
    a = cs.filter(F.col("yr") == 1996).select(
        "p_partkey", "p_brand",
        F.col("rev").alias("rev_y1"), F.col("cnt").alias("cnt_y1"),
    )
    b = cs.filter(F.col("yr") == 1997).select(
        F.col("p_partkey").alias("pk2"),
        F.col("rev").alias("rev_y2"), F.col("cnt").alias("cnt_y2"),
    )
    return (
        a.join(b, a.p_partkey == b.pk2)
        .filter(F.col("rev_y2") > F.col("rev_y1"))
        .select("p_partkey", "p_brand", "rev_y1", "rev_y2", "cnt_y1", "cnt_y2")
        .orderBy("p_partkey")
        .limit(100)
    )


# q14a shape: channels = order priorities; a part qualifies when it sells
# in ALL THREE channels (3-way INTERSECT), then 1995 revenue over the
# qualifying parts rolls up brand within part type.
_CHANNELS = ("1-URGENT", "2-HIGH", "3-MEDIUM")


def _channel_sql(prio: str) -> str:
    return (
        "SELECT l.l_partkey FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        f"WHERE o.o_orderpriority = '{prio}'"
    )


_Q14_ORACLE = f"""
WITH cross_parts AS (
    {_channel_sql(_CHANNELS[0])}
    INTERSECT
    {_channel_sql(_CHANNELS[1])}
    INTERSECT
    {_channel_sql(_CHANNELS[2])}
)
SELECT p.p_type, p.p_brand,
       CAST(GROUPING(p.p_type) + GROUPING(p.p_brand) AS INT) AS lochierarchy,
       {dsum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS rev,
       COUNT(*) AS cnt
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN part p   ON l.l_partkey = p.p_partkey
WHERE year(o.o_orderdate) = 1995
  AND l.l_partkey IN (SELECT l_partkey FROM cross_parts)
GROUP BY ROLLUP(p.p_type, p.p_brand)
"""


@query(
    "complex_q14_intersect_rollup",
    tags=("complex", "intersect", "rollup", "tpcds-shape"),
    oracle=_Q14_ORACLE,
)
def complex_q14_intersect_rollup(spark, sf_dir):
    """q14a shape (TPCDSBenchmarkQueries.scala:788-998): a 3-way
    INTERSECT (parts selling in all three priority channels) gates the
    fact aggregation, which rolls up under GROUP BY ROLLUP with a
    grouping()-level column. The intersect runs on (partkey) only —
    Catalyst plans it as semi-joins over distinct key sets — and the
    qualifying set joins back as a semi-join, so fact rows never carry
    channel duplication."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    p = table(spark, sf_dir, "part")

    def channel(prio: str):
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .filter(F.col("o_orderpriority") == prio)
            .select("l_partkey")
        )

    cross_parts = (
        channel(_CHANNELS[0])
        .intersect(channel(_CHANNELS[1]))
        .intersect(channel(_CHANNELS[2]))
    )
    fact = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.year("o_orderdate") == 1995)
        .join(cross_parts, "l_partkey", "left_semi")
        .join(p, li.l_partkey == p.p_partkey)
    )
    return fact.rollup("p_type", "p_brand").agg(
        (F.grouping("p_type") + F.grouping("p_brand")).cast("int").alias("lochierarchy"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        F.count(F.lit(1)).alias("cnt"),
    )


# q78 shape: per (part, order-year) revenue per channel (channels =
# order priorities), FULL OUTER joined across the three channels on the
# aggregate key, ratio computed over coalesced sides.
_Q78_CHANNEL_SQL = """
    SELECT l.l_partkey AS pk, year(o.o_orderdate) AS yr,
           {rev} AS rev, COUNT(*) AS cnt
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '{prio}'
    GROUP BY l.l_partkey, year(o.o_orderdate)
"""

_Q78_ORACLE = f"""
WITH a AS ({_Q78_CHANNEL_SQL.format(rev=dsum_sql("l.l_extendedprice * (1 - l.l_discount)"), prio="1-URGENT")}),
     b AS ({_Q78_CHANNEL_SQL.format(rev=dsum_sql("l.l_extendedprice * (1 - l.l_discount)"), prio="2-HIGH")}),
     c AS ({_Q78_CHANNEL_SQL.format(rev=dsum_sql("l.l_extendedprice * (1 - l.l_discount)"), prio="3-MEDIUM")}),
     j AS (
        SELECT COALESCE(a.pk, b.pk, c.pk) AS pk,
               COALESCE(a.yr, b.yr, c.yr) AS yr,
               COALESCE(a.rev, 0) AS rev_a,
               COALESCE(b.rev, 0) AS rev_b,
               COALESCE(c.rev, 0) AS rev_c,
               COALESCE(a.cnt, 0) + COALESCE(b.cnt, 0) + COALESCE(c.cnt, 0) AS cnt_all
        FROM a
        FULL OUTER JOIN b ON a.pk = b.pk AND a.yr = b.yr
        FULL OUTER JOIN c ON COALESCE(a.pk, b.pk) = c.pk AND COALESCE(a.yr, b.yr) = c.yr
     )
SELECT pk, yr, rev_a, rev_b, rev_c, cnt_all,
       ROUND(rev_a / (rev_a + rev_b + rev_c), 6) AS share_a
FROM j
WHERE rev_a > 0
ORDER BY share_a DESC, pk, yr
LIMIT 100
"""


@query(
    "complex_q78_channel_join",
    tags=("complex", "full-outer", "tpcds-shape"),
    oracle=_Q78_ORACLE,
)
def complex_q78_channel_join(spark, sf_dir):
    """q78 shape (TPCDSBenchmarkQueries.scala q78: per-key-year channel
    aggregates FULL OUTER joined across three channels, ratio over the
    coalesced sides, top-k by share): three fact aggregations (one
    shuffle each), then two FULL OUTER joins on the aggregated item-year
    frames — item-sized, never fact-sized. Top-100 fully tie-broken
    (share DESC, pk, yr)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")

    def channel(prio, tag):
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .filter(F.col("o_orderpriority") == prio)
            .groupBy(
                F.col("l_partkey").alias(f"pk_{tag}"),
                F.year("o_orderdate").alias(f"yr_{tag}"),
            )
            .agg(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(f"rev_{tag}"),
                F.count(F.lit(1)).alias(f"cnt_{tag}"),
            )
        )

    a, b, c = channel("1-URGENT", "a"), channel("2-HIGH", "b"), channel("3-MEDIUM", "c")
    ab = a.join(
        b,
        (F.col("pk_a") == F.col("pk_b")) & (F.col("yr_a") == F.col("yr_b")),
        "full_outer",
    )
    abc = ab.join(
        c,
        (F.coalesce("pk_a", "pk_b") == F.col("pk_c"))
        & (F.coalesce("yr_a", "yr_b") == F.col("yr_c")),
        "full_outer",
    )
    j = abc.select(
        F.coalesce("pk_a", "pk_b", "pk_c").alias("pk"),
        F.coalesce("yr_a", "yr_b", "yr_c").alias("yr"),
        F.coalesce("rev_a", F.lit(0.0)).alias("rev_a"),
        F.coalesce("rev_b", F.lit(0.0)).alias("rev_b"),
        F.coalesce("rev_c", F.lit(0.0)).alias("rev_c"),
        (
            F.coalesce("cnt_a", F.lit(0))
            + F.coalesce("cnt_b", F.lit(0))
            + F.coalesce("cnt_c", F.lit(0))
        ).alias("cnt_all"),
    )
    return (
        j.filter(F.col("rev_a") > 0)
        .withColumn(
            "share_a",
            F.round(F.col("rev_a") / (F.col("rev_a") + F.col("rev_b") + F.col("rev_c")), 6),
        )
        .orderBy(F.desc("share_a"), F.asc("pk"), F.asc("yr"))
        .limit(100)
    )


# q51 shape: per-channel monthly revenue per part, CUMULATIVE window sum
# over months, FULL OUTER join of the two channel series, filter where
# one channel's cumulative overtakes the other.
_Q51_MONTHLY_SQL = """
    SELECT l.l_partkey AS pk, date_trunc('month', o.o_orderdate) AS mo,
           {rev} AS rev
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '{prio}'
    GROUP BY l.l_partkey, date_trunc('month', o.o_orderdate)
"""

_Q51_ORACLE = f"""
WITH m_a AS ({_Q51_MONTHLY_SQL.format(rev=dsum_sql("l.l_extendedprice * (1 - l.l_discount)"), prio="1-URGENT")}),
     m_b AS ({_Q51_MONTHLY_SQL.format(rev=dsum_sql("l.l_extendedprice * (1 - l.l_discount)"), prio="2-HIGH")}),
     c_a AS (
        SELECT pk, mo, SUM(rev) OVER (
            PARTITION BY pk ORDER BY mo
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM m_a
     ),
     c_b AS (
        SELECT pk, mo, SUM(rev) OVER (
            PARTITION BY pk ORDER BY mo
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM m_b
     )
SELECT COALESCE(a.pk, b.pk) AS pk,
       COALESCE(a.mo, b.mo) AS mo,
       ROUND(a.cum, 6) AS cum_urgent,
       ROUND(b.cum, 6) AS cum_high
FROM c_a a FULL OUTER JOIN c_b b ON a.pk = b.pk AND a.mo = b.mo
WHERE a.cum > b.cum
ORDER BY pk, mo
LIMIT 100
"""


@query(
    "complex_q51_cumulative_join",
    tags=("complex", "window", "full-outer", "tpcds-shape"),
    oracle=_Q51_ORACLE,
)
def complex_q51_cumulative_join(spark, sf_dir):
    """q51 shape (TPCDSBenchmarkQueries.scala q51: per-channel cumulative
    window series FULL OUTER joined on (item, period), filtered where one
    channel's running total overtakes the other): each channel is one
    fact aggregation + one ordered window (running sums accumulate in
    frame order — the same IEEE sequence both engines execute, so values
    match bitwise); the join runs on month-level aggregates, never fact
    rows. Top-100 tie-broken on the unique (pk, mo)."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")

    def channel_cum(prio, tag):
        monthly = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .filter(F.col("o_orderpriority") == prio)
            .groupBy(
                F.col("l_partkey").alias(f"pk_{tag}"),
                # trunc() yields DATE, matching DuckDB's date_trunc('month')
                # which returns DATE at month precision
                F.trunc("o_orderdate", "month").alias(f"mo_{tag}"),
            )
            .agg(
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(f"rev_{tag}")
            )
        )
        w = (
            Window.partitionBy(f"pk_{tag}")
            .orderBy(f"mo_{tag}")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return monthly.select(
            f"pk_{tag}", f"mo_{tag}",
            F.sum(f"rev_{tag}").over(w).alias(f"cum_{tag}"),
        )

    a = channel_cum("1-URGENT", "a")
    b = channel_cum("2-HIGH", "b")
    j = a.join(
        b,
        (F.col("pk_a") == F.col("pk_b")) & (F.col("mo_a") == F.col("mo_b")),
        "full_outer",
    )
    return (
        j.filter(F.col("cum_a") > F.col("cum_b"))
        .select(
            F.coalesce("pk_a", "pk_b").alias("pk"),
            F.coalesce("mo_a", "mo_b").alias("mo"),
            F.round("cum_a", 6).alias("cum_urgent"),
            F.round("cum_b", 6).alias("cum_high"),
        )
        .orderBy("pk", "mo")
        .limit(100)
    )
