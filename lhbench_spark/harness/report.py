"""Benchmark report model — JSON + CSV serialization.

Mirrors ``BenchmarkReport(benchmarkSpecs, queryResults, extraMetrics)``
and its Jackson/CSV writers (reference: Benchmark.scala:83-88, 208-242)
plus the environment capture (SparkUtils.scala:24-43), as plain Python
dataclasses — no external dependencies.
"""

from __future__ import annotations

import csv
import io
import json
import platform
import sys
from dataclasses import asdict, dataclass, field

from pyspark.sql import SparkSession

from lhbench_spark.harness.runner import QueryResult


def spark_env_info(spark: SparkSession) -> dict[str, str]:
    """Environment snapshot recorded into every report."""
    sc = spark.sparkContext
    return {
        "spark_version": sc.version,
        "master": sc.master,
        "default_parallelism": str(sc.defaultParallelism),
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
        "python": sys.version.split()[0],
        "platform": platform.platform(),
    }


@dataclass
class BenchmarkReport:
    benchmark_id: str
    specs: dict[str, str] = field(default_factory=dict)
    env: dict[str, str] = field(default_factory=dict)
    query_results: list[QueryResult] = field(default_factory=list)
    extra_metrics: dict[str, float] = field(default_factory=dict)
    # Per-query {median_sec, min_sec, jobs, iters} — the host-immune
    # summary (BenchmarkRunner.per_query_stats); empty when the caller
    # doesn't populate it.
    query_stats: dict = field(default_factory=dict)

    def report_extra_metric(self, name: str, value: float) -> None:
        """reportExtraMetric analog (Benchmark.scala:196-199)."""
        self.extra_metrics[name] = value

    def to_dict(self) -> dict:
        return asdict(self)

    def to_json(self, path: str | None = None) -> str:
        text = json.dumps(self.to_dict(), indent=2, sort_keys=True)
        if path:
            with open(path, "w") as f:
                f.write(text + "\n")
        return text

    def to_csv(self, path: str | None = None) -> str:
        """Per-query-result CSV (Benchmark.scala:220-231 analog)."""
        buf = io.StringIO()
        w = csv.writer(buf)
        w.writerow(
            ["name", "iteration", "duration_ms", "planning_ms", "row_count", "error"]
        )
        for r in self.query_results:
            w.writerow(
                [
                    r.name,
                    r.iteration,
                    f"{r.duration_ms:.1f}",
                    "" if r.planning_ms is None else f"{r.planning_ms:.1f}",
                    r.row_count,
                    r.error_msg or "",
                ]
            )
        text = buf.getvalue()
        if path:
            with open(path, "w") as f:
                f.write(text)
        return text
