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
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
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


_REGISTERED: dict[int, str] = {}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view, enabling the ``spark.sql`` path
    (the reference's only query entry point, Benchmark.scala:146).

    Idempotent per (session, sf_dir): temp views persist in the session
    catalog, so repeat calls skip the 10 ``spark.read.parquet`` schema
    inferences (py4j + footer reads) a fresh registration costs."""
    key = os.path.abspath(sf_dir)
    sid = id(spark)
    if _REGISTERED.get(sid) == key:
        return
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
    _REGISTERED[sid] = key
