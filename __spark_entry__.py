"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All queries live in the lhbench_spark registry (lhbench_spark/queries/),
where each registration pairs the PySpark implementation with its DuckDB
oracle — this module just re-exposes the registry in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lhbench_spark.queries.registry import gate_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Uses the TPC-H Q3-shaped star join (the reference q3 analog,
    TPCDSBenchmarkQueries.scala:104-123): 3-way join + agg + top-k."""
    from lhbench_spark.queries.joins import join_shipping_priority

    return join_shipping_priority(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Dict order is the gate-rotation lever: queries without an external
    green row are inserted FIRST (the driver checks the first ~50 in
    insertion order), and names already holding an external green row
    carry the documented 'verified_' prefix (registry.DRIVER_GREEN) so
    the rotation is visible in CORRECTNESS_r{N}.json itself."""
    return {name: qd.spark_fn for name, qd in gate_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; rows-only
    queries (mapInPandas paths) are intentionally absent."""
    return {
        name: qd.oracle
        for name, qd in gate_queries().items()
        if qd.oracle is not None
    }
