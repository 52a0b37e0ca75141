"""Table registry over the driver-generated testdata parquet.

The reference loads a fixed star schema and queries tables by name
(reference: TPCDSDataLoad.scala:117-126, every query via ``spark.sql``).
Here the fixed schema is the driver's TPC-H-ish set (TESTDATA.md); we
expose both DataFrame handles and temp views so queries can be written in
either the DataFrame API or SQL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Input-table schema memo, keyed per (session, sf_dir, name): the file
# SCHEMA is static metadata of the test inputs (the same thing the temp
# view registration below pins once), but a bare spark.read.parquet()
# re-infers it — a py4j round-trip plus a footer read — on EVERY call,
# and multi-table queries call table() 3-6 times each. Only the schema
# is memoized; every query still scans the parquet data itself.
_SCHEMA_MEMO: dict[tuple[int, str, str], object] = {}


def table_schema(spark: SparkSession, sf_dir: str, name: str):
    """The RAW file schema of one testdata table (memoized metadata)."""
    key = (id(spark), os.path.abspath(sf_dir), name)
    st = _SCHEMA_MEMO.get(key)
    if st is None:
        st = spark.read.parquet(f"{sf_dir}/{name}.parquet").schema
        _SCHEMA_MEMO[key] = st
    return st


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Parquet scan → Catalyst gets column pruning
    and predicate pushdown for free; callers must not ``.cache()`` by
    default (the reference never caches, Benchmark.scala:146-147).

    `events.ts` has shipped as both TIMESTAMP(MICROS) (reads as a
    timestamp directly) and TIMESTAMP(NANOS) (with
    ``spark.sql.legacy.parquet.nanosAsLong`` it reads as a long of epoch
    nanos). Dispatch on the *actual* read dtype rather than assuming one
    encoding — a session we don't control (the driver's) may configure the
    reader differently. The long path converts with integer ns→µs
    division, matching DuckDB's truncation exactly. No per-call
    session-conf mutation here: reads must be pure."""
    df = spark.read.schema(table_schema(spark, sf_dir, name)).parquet(
        f"{sf_dir}/{name}.parquet"
    )
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All tables as a dict (lazy scans; nothing is materialized)."""
    return {name: table(spark, sf_dir, name) for name in TABLES}


# --- temp-view registration memo, shared across view FAMILIES ------------
# Two families register temp views into the session catalog: these TPC-H
# testdata tables and the generated TPC-DS tables (tpcds_data). The name
# `customer` exists in BOTH — so a family's registration memo must be
# invalidated whenever another family (re)registers, or a memoized skip
# would leave the colliding name pointing at the other family's table
# (this exact bug made adhoc_* queries resolve TPC-DS `customer` in
# bench iteration 2). Each family memoizes per (session, sf_dir) and
# clears every OTHER family's memo when it actually registers.

_VIEW_MEMOS: dict[str, dict[int, str]] = {}


def views_current(family: str, spark: SparkSession, sf_dir: str) -> bool:
    """True iff `family`'s views for this (session, sf_dir) are still the
    most recent registration (no other family overwrote since)."""
    memo = _VIEW_MEMOS.setdefault(family, {})
    return memo.get(id(spark)) == os.path.abspath(sf_dir)


def mark_views_registered(family: str, spark: SparkSession, sf_dir: str) -> None:
    """Record `family` as the current owner of the view namespace for
    this session; invalidate every other family's memo for it."""
    sid = id(spark)
    for fam, memo in _VIEW_MEMOS.items():
        if fam != family:
            memo.pop(sid, None)
    _VIEW_MEMOS.setdefault(family, {})[sid] = os.path.abspath(sf_dir)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view, enabling the ``spark.sql`` path
    (the reference's only query entry point, Benchmark.scala:146).

    Idempotent per (session, sf_dir): temp views persist in the session
    catalog, so repeat calls skip the 10 ``spark.read.parquet`` schema
    inferences (py4j + footer reads) a fresh registration costs."""
    if views_current("tpch", spark, sf_dir):
        return
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
    mark_views_registered("tpch", spark, sf_dir)
