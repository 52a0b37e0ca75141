"""The spark.sql entry path over registered temp views.

The reference's ONLY query entry point is a SQL string handed to
``spark.sql`` over catalog tables (reference: Benchmark.scala:146;
views registered IncrementalTPCDSBenchmark.scala:269-271). These entries
exercise that path end-to-end: catalog.register_views → spark.sql →
result. The query text is dialect-portable, so the SAME string is the
DuckDB oracle — zero translation, the strongest possible parity check
for the SQL surface.
"""

from __future__ import annotations

from lhbench_spark.catalog import register_views
from lhbench_spark.queries.registry import query

# One shared text per query: runs verbatim on Spark SQL AND DuckDB.
_VIEW_JOIN_SQL = """
SELECT n_name,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,8)))
            AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_totalprice > 1000
GROUP BY n_name
"""

_VIEW_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,8))) AS DOUBLE) AS qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("adhoc_temp_view_join", tags=("sql-path", "temp-view", "join"), oracle=_VIEW_JOIN_SQL)
def adhoc_temp_view_join(spark, sf_dir):
    """4-way join + agg through the spark.sql path over temp views —
    the reference's execution shape verbatim, with the identical text
    running as its own oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_VIEW_JOIN_SQL)


@query("adhoc_temp_view_rollup", tags=("sql-path", "temp-view", "rollup"), oracle=_VIEW_ROLLUP_SQL)
def adhoc_temp_view_rollup(spark, sf_dir):
    """GROUP BY ROLLUP through the spark.sql path — same shared text."""
    register_views(spark, sf_dir)
    return spark.sql(_VIEW_ROLLUP_SQL)


# CUBE completes the grouping-set family (SURVEY §2.4 lists it as
# available-but-unused in the reference: 0 hits in the 103 queries).
# GROUPING() columns disambiguate "NULL because subtotal" from data NULLs,
# exactly as the reference's rollup queries do (q27/q36/q70 idiom).
_VIEW_CUBE_SQL = """
SELECT o_orderpriority, o_orderstatus,
       GROUPING(o_orderpriority) AS g_prio,
       GROUPING(o_orderstatus) AS g_status,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,8))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


@query("adhoc_temp_view_cube", tags=("sql-path", "temp-view", "cube"), oracle=_VIEW_CUBE_SQL)
def adhoc_temp_view_cube(spark, sf_dir):
    """GROUP BY CUBE + grouping() through the spark.sql path — same shared
    text on both engines. Cube is an Expand (4 grouping sets) over one
    hash-agg shuffle, not 4 scans."""
    register_views(spark, sf_dir)
    return spark.sql(_VIEW_CUBE_SQL)


_BUCKETED_ORACLE = """
SELECT c_custkey, c_name,
       COUNT(*) AS order_cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,8))) AS DOUBLE) AS total
FROM customer JOIN orders ON c_custkey = o_custkey
WHERE c_custkey % 97 = 0
GROUP BY c_custkey, c_name
"""


@query(
    "join_bucketed_colocated",
    tags=("ddl", "bucketing", "join", "physical"),
    oracle=_BUCKETED_ORACLE,
)
def join_bucketed_colocated(spark, sf_dir):
    """Shuffle-free co-located join via bucketed tables — the technique
    that removes the fact-fact exchange at 100 TB: write both sides
    ``bucketBy(N, join_key).sortBy(join_key)`` (one-time shuffle at write,
    amortized over every later join), then join + group on the bucket key
    with NO Exchange anywhere in the physical plan — scans come up already
    hash-clustered and sorted, so sort-merge join and the final hash-agg
    both reuse the on-disk partitioning. The no-Exchange property is
    asserted on the plan, not just claimed; the DuckDB oracle checks the
    join's values."""
    import tempfile

    from pyspark.sql import functions as F

    from lhbench_spark.catalog import table
    from lhbench_spark.functions.numeric import dsum

    db = "lhb_buck"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    spark.sql(
        f"CREATE DATABASE {db} LOCATION '{tempfile.mkdtemp(prefix='lhbench_buck_')}'"
    )
    (
        table(spark, sf_dir, "customer")
        .write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .saveAsTable(f"{db}.customer_b")
    )
    (
        table(spark, sf_dir, "orders")
        .write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable(f"{db}.orders_b")
    )
    c = spark.table(f"{db}.customer_b")
    o = spark.table(f"{db}.orders_b")
    out = (
        # hint("merge") pins sort-merge so the planner cannot pick a
        # broadcast join (whose BroadcastExchange would defeat the
        # co-location demonstration once the filter prunes one side).
        c.hint("merge")
        .join(o, c.c_custkey == o.o_custkey)
        .filter(F.col("c_custkey") % 97 == 0)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            dsum("o_totalprice").alias("total"),
        )
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed join plan has a shuffle:\n{plan}"
    return out


# Database lifecycle: the loader's catalog choreography
# (TPCDSDataLoad.scala:91-133 — CREATE DATABASE … LOCATION, DROP TABLE IF
# EXISTS, CTAS per table, USE db, row-count validation;
# FileCountBenchmark.scala:127-136 — SHOW TABLES existence probe,
# DROP DATABASE CASCADE). The oracle counts the sources directly, so
# loaded_rows is value-checked: any write→read row loss flips `validated`
# to 0 and fails the hash.
_DB_ORACLE = """
SELECT 'nation' AS tbl, (SELECT COUNT(*) FROM nation) AS loaded_rows, 1 AS validated
UNION ALL
SELECT 'orders', (SELECT COUNT(*) FROM orders), 1
UNION ALL
SELECT 'supplier', (SELECT COUNT(*) FROM supplier), 1
"""


@query("warehouse_db_lifecycle", tags=("ddl", "catalog", "database"), oracle=_DB_ORACLE)
def warehouse_db_lifecycle(spark, sf_dir):
    """CREATE DATABASE … LOCATION → per-table CTAS via saveAsTable (orders
    partitioned, mirroring the partitioned loads) → DROP TABLE IF EXISTS +
    re-create (the loader's idempotent path) → SHOW TABLES existence probe
    → qualified-name `spark.table` read-back → source-vs-loaded row-count
    validation. Catalog probes (SHOW TABLES) are driver-side metadata by
    nature — O(tables), never O(rows)."""
    import tempfile

    from pyspark.sql import functions as F

    from lhbench_spark.catalog import table

    db = "lhb_cat"
    loc = tempfile.mkdtemp(prefix="lhbench_db_")
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    spark.sql(f"CREATE DATABASE {db} LOCATION '{loc}'")
    for name, part in (("nation", None), ("supplier", None), ("orders", "o_orderpriority")):
        w = table(spark, sf_dir, name).write.format("parquet").mode("overwrite")
        if part:
            w = w.partitionBy(part)
        w.saveAsTable(f"{db}.{name}")
    spark.sql(f"DROP TABLE IF EXISTS {db}.nation")
    table(spark, sf_dir, "nation").write.format("parquet").saveAsTable(f"{db}.nation")

    # SHOW TABLES also lists session temp views (isTemporary) — the
    # existence probe is about the database's tables only.
    listed = sorted(
        r.tableName
        for r in spark.sql(f"SHOW TABLES IN {db}").collect()
        if not r.isTemporary
    )
    assert listed == ["nation", "orders", "supplier"], listed

    frames = []
    for name in listed:
        loaded = spark.table(f"{db}.{name}").agg(
            F.count(F.lit(1)).alias("loaded_rows")
        )
        src = table(spark, sf_dir, name).agg(F.count(F.lit(1)).alias("_src_rows"))
        frames.append(
            loaded.crossJoin(src).select(
                F.lit(name).alias("tbl"),
                "loaded_rows",
                (F.col("loaded_rows") == F.col("_src_rows")).cast("int").alias("validated"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# Explicit GROUPING SETS completes the grouping family next to ROLLUP and
# CUBE — the lattice here is NOT a rollup prefix chain (it includes the
# (o_orderpriority) set alone), so it exercises the general Expand path.
_VIEW_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus) AS g_status,
       GROUPING(o_orderpriority) AS g_prio,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,8))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), (o_orderpriority), ())
"""


@query(
    "adhoc_grouping_sets",
    tags=("sql-path", "grouping-sets", "agg"),
    oracle=_VIEW_GROUPING_SETS_SQL,
)
def adhoc_grouping_sets(spark, sf_dir):
    """GROUP BY GROUPING SETS through the spark.sql path — the shared
    dialect-portable text is its own oracle. Expand multiplies rows by 4
    BEFORE the shuffle, but map-side partial agg collapses each set to
    its group cardinality first — shuffle stays tiny at any scale."""
    register_views(spark, sf_dir)
    return spark.sql(_VIEW_GROUPING_SETS_SQL)


# Multi-level CTE chain (agg -> re-agg -> window over join) — the
# analytical report shape that dominates the reference's TPC-DS texts:
# two stacked aggregations then a ranked dimension join. Decimal-exact
# sums keep every double bit-identical, so RANK over them is stable.
_VIEW_CTE_CHAIN_SQL = """
WITH cust_rev AS (
    SELECT c_custkey, c_nationkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,8))) AS DOUBLE) AS rev
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_nationkey
), nation_stats AS (
    SELECT c_nationkey, COUNT(*) AS n_cust,
           CAST(SUM(CAST(rev AS DECIMAL(18,8))) AS DOUBLE) AS nation_rev
    FROM cust_rev GROUP BY c_nationkey
)
SELECT n_name, n_cust, nation_rev,
       RANK() OVER (ORDER BY nation_rev DESC) AS rev_rank
FROM nation_stats JOIN nation ON c_nationkey = n_nationkey
"""


@query("adhoc_cte_chain", tags=("sql-path", "cte", "window"), oracle=_VIEW_CTE_CHAIN_SQL)
def adhoc_cte_chain(spark, sf_dir):
    """Stacked-CTE report through spark.sql: per-customer revenue,
    re-aggregated per nation, ranked. The second agg rides the first's
    partitioning; the nation join broadcasts (25 rows); the global RANK
    sorts 25 rows — one real shuffle total."""
    register_views(spark, sf_dir)
    return spark.sql(_VIEW_CTE_CHAIN_SQL)


# Latest-row-per-key (ROW_NUMBER = 1 over a descending sort) — the
# dedup-to-latest idiom every CDC/refresh pipeline runs, aggregated to
# monthly cardinalities. Fully tie-broken by (date, key).
_VIEW_LATEST_SQL = """
WITH latest AS (
    SELECT o_orderkey, o_custkey, o_orderdate
    FROM (
        SELECT o_orderkey, o_custkey, o_orderdate,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
    ) ranked
    WHERE rn = 1
)
SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
       COUNT(*) AS n_customers
FROM latest
GROUP BY 1
"""


@query("adhoc_latest_per_key", tags=("sql-path", "window", "dedup-latest"), oracle=_VIEW_LATEST_SQL)
def adhoc_latest_per_key(spark, sf_dir):
    """Latest-order-per-customer via ROW_NUMBER()=1 (WindowGroupLimit
    pushes the limit into the sort — no full-partition materialization),
    then a monthly rollup."""
    register_views(spark, sf_dir)
    return spark.sql(_VIEW_LATEST_SQL)
