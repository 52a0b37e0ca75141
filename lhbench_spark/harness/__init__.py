"""Benchmark harness — runner + report.

PySpark analog of the reference's measurement core
(reference: src/main/scala/benchmark/Benchmark.scala:61-274): per-query
wall-clock timing around plan+execute+fetch, job-group attribution,
error capture that never aborts the suite, iteration medians (upper
median), and a JSON/CSV report.
"""

from lhbench_spark.harness.runner import (
    BenchmarkRunner,
    QueryResult,
    upper_median,
)
from lhbench_spark.harness.report import BenchmarkReport

__all__ = ["BenchmarkRunner", "QueryResult", "BenchmarkReport", "upper_median"]
