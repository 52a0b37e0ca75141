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
