"""Query inventory. Importing this package registers every query module."""

from lhbench_spark.queries.registry import QueryDef, all_queries, get_query

# Import for side effect: each module registers its queries.
from lhbench_spark.queries import (  # noqa: F401
    aggregates,
    assembly,
    joins,
    windows,
    setops,
    scalars,
    subqueries,
    events,
    dml,
    complex,
    workloads,
    sqlpath,
    dedup,
    similarity,
    text,
    multimodal,
    streamq,
    tpcds_queries,
    tpcds_refresh,
    training,
)

__all__ = ["QueryDef", "all_queries", "get_query"]
