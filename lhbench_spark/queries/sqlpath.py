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


@query("sql_temp_view_join", tags=("sql-path", "temp-view", "join"), oracle=_VIEW_JOIN_SQL)
def sql_temp_view_join(spark, sf_dir):
    """4-way join + agg through the spark.sql path over temp views —
    the reference's execution shape verbatim, with the identical text
    running as its own oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_VIEW_JOIN_SQL)


@query("sql_temp_view_rollup", tags=("sql-path", "temp-view", "rollup"), oracle=_VIEW_ROLLUP_SQL)
def sql_temp_view_rollup(spark, sf_dir):
    """GROUP BY ROLLUP through the spark.sql path — same shared text."""
    register_views(spark, sf_dir)
    return spark.sql(_VIEW_ROLLUP_SQL)


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


@query("catalog_db_lifecycle", tags=("ddl", "catalog", "database"), oracle=_DB_ORACLE)
def catalog_db_lifecycle(spark, sf_dir):
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
