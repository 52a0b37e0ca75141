"""Plain DataFrameWriter sinks — the non-managed write surface.

The managed table (lhbench_spark.tables) owns the manifest-versioned
path; this module covers the reference's direct DataFrameWriter usages
(reference: IncrementalTPCDSBenchmark.scala:363-374
``.write.format("parquet").mode("overwrite").partitionBy(...)``;
FileCountBenchmark.scala:233-237 ``.partitionBy().option("path")``),
i.e. Hive-style key=value partition layouts that downstream systems
expect, plus the write-shaping helpers.

At scale: ``partition_by`` columns should be low-cardinality (one
directory per value); pair with ``files_per_partition`` repartitioning so
each partition directory gets a bounded file count instead of one file
per upstream task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...],
    mode: str = "overwrite",
    files_per_partition: int | None = None,
    sort_within: tuple[str, ...] = (),
) -> None:
    """Hive-style partitioned parquet write. ``files_per_partition``
    repartitions on the partition keys (+ optional salt) so each
    key=value directory holds a bounded number of files; ``sort_within``
    gives tight min/max stats inside each file
    (FileCountBenchmark.scala:230-237)."""
    shaped = df
    if files_per_partition:
        cols = [F.col(c) for c in partition_by]
        if files_per_partition > 1:
            cols.append((F.spark_partition_id() % files_per_partition).alias("_salt"))
        shaped = df.repartition(*cols)
    if sort_within:
        shaped = shaped.sortWithinPartitions(*sort_within)
    shaped.write.mode(mode).partitionBy(*partition_by).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a Hive-layout directory back; partition columns are recovered
    from the key=value paths and benefit from partition pruning."""
    return spark.read.parquet(path)
