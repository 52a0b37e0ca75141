"""Central query registry.

Every operator family from SURVEY.md §2 is represented by at least one
registered query. A registration carries BOTH the PySpark implementation
and (when SQL-expressible) the equivalent DuckDB oracle SQL — the same
pairing the driver's correctness gate consumes via ``__spark_entry__``.

Determinism contract (applies to every registered query):
- Order-insensitive compare ⇒ no ORDER BY needed for correctness, but any
  LIMIT/top-k MUST be fully tie-broken.
- Double aggregation is made engine-exact by summing via DECIMAL and
  casting the result back to DOUBLE (helpers in
  ``lhbench_spark.functions.numeric``); per-row double arithmetic is
  IEEE-identical across engines and needs no such treatment.
- Output column names must match the oracle exactly (driver sorts columns
  by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    spark_fn: SparkQuery
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QueryDef] = {}


def query(
    name: str, *, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(
            name=name, spark_fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags
        )
        return fn

    return deco


def all_queries() -> dict[str, QueryDef]:
    return dict(_REGISTRY)


def get_query(name: str) -> QueryDef:
    return _REGISTRY[name]
