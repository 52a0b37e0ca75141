"""Scalar-function family (SURVEY.md §2.8) + sorts/limits (§2.6).

Covers: string funcs (substr/upper/lower/length/like/concat — reference
q15/q24/q62/q85), date funcs (year/month/interval arithmetic — 16 queries
use `+ interval N days`), math (round/abs/%/division), conditional
(CASE/coalesce/nullif idiom — 28 queries), casts, and the tie-broken
top-k ORDER BY+LIMIT idiom (80+ queries end in LIMIT 100).

Everything stays in whole-stage codegen — these are all JVM built-ins;
no Python UDF appears anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lhbench_spark.catalog import table
from lhbench_spark.queries.registry import query


@query(
    "scalar_string_funcs",
    tags=("scalar", "string"),
    oracle="""
SELECT p_partkey,
       UPPER(SUBSTR(p_name, 1, 5)) AS name_prefix,
       LENGTH(p_name) AS name_len,
       CONCAT(p_brand, ':', p_type) AS brand_type,
       LOWER(p_type) AS type_lower
FROM part
WHERE p_name LIKE '%bolt%' OR p_name LIKE 'red%'
""",
)
def scalar_string_funcs(spark, sf_dir):
    """substr/upper/lower/length/concat/LIKE — reference q15 (substr +
    LIKE), q24 (upper), q62 (substr(w_warehouse_name,1,20))."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%bolt%") | F.col("p_name").like("red%")
    ).select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 5)).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.lower("p_type").alias("type_lower"),
    )


@query(
    "scalar_date_funcs",
    tags=("scalar", "date"),
    oracle="""
SELECT CAST(YEAR(o_orderdate) AS INT) AS order_year,
       CAST(MONTH(o_orderdate) AS INT) AS order_month,
       COUNT(*) AS cnt
FROM orders
WHERE o_orderdate + INTERVAL 30 DAY < TIMESTAMP '1999-01-01'
  AND o_orderdate >= TIMESTAMP '1997-06-01'
GROUP BY 1, 2
""",
)
def scalar_date_funcs(spark, sf_dir):
    """year/month extraction + interval arithmetic in a predicate —
    reference `(cast(... as date) + interval N days)` idiom used by 16
    queries (q5,q12,q16,...,q98). Session TZ is pinned UTC so timestamp
    extraction matches the oracle's naive timestamps."""
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY") < F.lit("1999-01-01").cast("timestamp"))
            & (F.col("o_orderdate") >= F.lit("1997-06-01").cast("timestamp"))
        )
        .groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "scalar_math_case",
    tags=("scalar", "math", "case"),
    oracle="""
SELECT l_orderkey % 10 AS bucket,
       COUNT(*) AS cnt,
       COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS high_disc_cnt,
       ROUND(ABS(MIN(l_extendedprice) - MAX(l_extendedprice)), 2) AS price_spread,
       COALESCE(MAX(CASE WHEN l_quantity > 49 THEN l_linenumber END), -1) AS max_bulk_line
FROM lineitem
GROUP BY 1
""",
)
def scalar_math_case(spark, sf_dir):
    """%, round, abs, CASE, coalesce — reference q47 (abs + nullif-style
    case), q2 (round), merge-micro `key % 1000`. min/max are
    order-independent so the double arithmetic on them is engine-exact."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy((F.col("l_orderkey") % 10).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("high_disc_cnt"),
            F.round(
                F.abs(F.min("l_extendedprice") - F.max("l_extendedprice")), 2
            ).alias("price_spread"),
            F.coalesce(
                F.max(F.when(F.col("l_quantity") > 49, F.col("l_linenumber"))),
                F.lit(-1),
            ).alias("max_bulk_line"),
        )
    )


@query(
    "scalar_casts",
    tags=("scalar", "cast"),
    oracle="""
SELECT o_orderkey,
       CAST(FLOOR(o_totalprice) AS BIGINT) AS price_int,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(o_orderdate AS DATE) AS order_date
FROM orders
WHERE o_orderkey % 97 = 0
""",
)
def scalar_casts(spark, sf_dir):
    """Explicit casts (double→bigint via FLOOR — Spark truncates while
    DuckDB rounds on a bare cast, so the floor is spelled out; int→string;
    timestamp→date) — ~80 of the reference's queries cast somewhere."""
    o = table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        F.floor("o_totalprice").cast("bigint").alias("price_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderdate").cast("date").alias("order_date"),
    )


@query(
    "sort_topk",
    tags=("sort", "limit", "topk"),
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def sort_topk(spark, sf_dir):
    """The LIMIT-100 top-k idiom ending 80+ reference queries. Catalyst
    fuses sort+limit into TakeOrderedAndProject: each partition keeps a
    local top-100, the driver merges — O(k) memory, no global sort, the
    right plan at any scale. Tie-broken on o_orderkey."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


@query(
    "cast_time_decode",
    tags=("scalar", "time"),
    oracle="""
SELECT event_type,
       CAST(SUM(
           CAST(substr(strftime(ts, '%H:%M:%S'), 1, 2) AS INT) * 3600
         + CAST(substr(strftime(ts, '%H:%M:%S'), 4, 2) AS INT) * 60
         + CAST(substr(strftime(ts, '%H:%M:%S'), 7, 2) AS INT)
       ) AS BIGINT) AS total_secs,
       CAST(MAX(
           CAST(substr(strftime(ts, '%H:%M:%S'), 1, 2) AS INT) * 3600
         + CAST(substr(strftime(ts, '%H:%M:%S'), 4, 2) AS INT) * 60
         + CAST(substr(strftime(ts, '%H:%M:%S'), 7, 2) AS INT)
       ) AS BIGINT) AS max_secs
FROM events
GROUP BY event_type
""",
)
def cast_time_decode(spark, sf_dir):
    """HH:MM:SS → seconds-since-midnight decode (the refresh schema's time
    decode, reference TPCDSRefreshSchema.scala:641-643) — exercised by
    round-tripping event timestamps through a formatted time string."""
    ev = table(spark, sf_dir, "events")
    t = F.date_format("ts", "HH:mm:ss")
    secs = (
        F.substring(t, 1, 2).cast("int") * 3600
        + F.substring(t, 4, 2).cast("int") * 60
        + F.substring(t, 7, 2).cast("int")
    )
    return ev.groupBy("event_type").agg(
        F.sum(secs).cast("bigint").alias("total_secs"),
        F.max(secs).cast("bigint").alias("max_secs"),
    )
