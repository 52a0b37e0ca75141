"""Large-scale data-pipeline operators (dedup, similarity, text,
multimodal) — all built from Spark built-ins; the only Python hot path is
Arrow-batched mapInPandas in multimodal."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Repartition to cluster parallelism before CPU-heavy per-row
    expressions (hashing, higher-order functions, vector math).

    Parquet split planning is BYTE-sized (spark.sql.files.maxPartitionBytes),
    so a small-on-disk table lands in one or two partitions and every
    downstream per-row computation runs on one core. Compute-bound stages
    must be partitioned for CPU, not bytes — one cheap narrow shuffle of
    the input buys full parallelism for everything after it.

    CONDITIONAL: when the scan already has >= target partitions (every
    100 TB scan does), return the input unchanged — repartition() always
    shuffles, so an unconditional call would be a pure pessimization at
    exactly the scale this module is designed for. The partition-count
    probe compiles the plan but runs no job."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * multiplier
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
