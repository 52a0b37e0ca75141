"""lhbench_spark — a PySpark-native analytics engine with the query and
data-processing capability surface of the lhbench reference benchmark
(CIDR 2023 lakehouse benchmark, /root/reference), re-expressed Spark-first.

The reference is a Spark-SQL workload harness over lakehouse table formats
(reference: src/main/scala/benchmark/Benchmark.scala:94-274). This package
provides the same capability surface natively in PySpark:

- ``session``    — SparkSession factory (AQE, shuffle sizing, UTC).
- ``catalog``    — table registry over the driver testdata parquet.
- ``queries``    — the operator-inventory query set (SURVEY.md §2), each
                   query paired with a DuckDB oracle SQL string.
- ``tables``     — a parquet-native managed table (versioned manifests)
                   providing MERGE INTO / DELETE / UPDATE / APPEND (with
                   additive schema evolution) / OPTIMIZE / DESCRIBE HISTORY
                   semantics (reference: IncrementalTPCDSBenchmark.scala:186-283).
- ``operators``  — large-scale data-pipeline operators: dedup (exact,
                   MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine),
                   similarity search, text analysis, multimodal plumbing.
- ``harness``    — benchmark runner/report (reference: Benchmark.scala:61-242).
- ``workloads``  — merge-micro and file-count workload analogs.
- ``streaming``  — Structured Streaming ops (windowed aggs, sessionization).
"""

__version__ = "0.1.0"
