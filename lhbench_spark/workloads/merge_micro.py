"""Merge microbenchmark: parameterized upsert mix on a synthetic table.

Analog of the reference's merge microbenchmark
(reference: MergeMicroBenchmark.scala:95-307): generate a keyed synthetic
table from a range source (:225-229), pick a rand()-sampled update set
plus an insert tail (:249-250), run N MERGE rounds (:204-213) with read
queries between rounds (:253-265), and report merge + read timings
through the shared harness.

Scale design: the generator is ``spark.range`` with an explicit split
count (parallel, no driver data); the update-set sample is a predicate on
``rand()`` — a scan-side filter, never a collect; merges are file-level
copy-on-write on a range-clustered table, so an update set touching p% of
the key space rewrites ~p% of files, which is the CoW cost model the
reference measures.
"""

from __future__ import annotations

import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lhbench_spark.harness import BenchmarkReport, BenchmarkRunner
from lhbench_spark.tables import ManagedTable


@dataclass
class MergeMicroConfig:
    rows: int = 1_000_000
    num_splits: int = 32
    num_files: int = 32
    update_pct: float = 0.01  # fraction of table updated per round
    insert_rows: int = 10_000
    rounds: int = 3
    iterations: int = 1
    seed: int = 42


def gen_table(spark: SparkSession, rows: int, num_splits: int) -> DataFrame:
    """Synthetic 4-column keyed table from a range source
    (MergeMicroBenchmark.scala:225-229 shape: key, derived double, derived
    string, bucketing key)."""
    return spark.range(0, rows, 1, num_splits).select(
        F.col("id").alias("key"),
        (F.col("id") * 7.1 + 13.4).alias("value"),
        F.conv(F.col("id").cast("string"), 10, 16).alias("skey"),
        (F.col("id") % 1000).alias("bucket"),
    )


def update_set(
    base: DataFrame, rows: int, update_pct: float, insert_rows: int, seed: int
) -> DataFrame:
    """rand()-sampled updates (MergeMicroBenchmark.scala:249) + an insert
    tail of fresh keys beyond the current max (:250)."""
    spark = base.sparkSession
    updates = base.filter(F.rand(seed) <= F.lit(update_pct)).withColumn(
        "value", F.col("value") * -1.0
    )
    inserts = gen_table(spark, rows + insert_rows, 8).filter(F.col("key") >= rows)
    return updates.unionByName(inserts)


def run(spark: SparkSession, cfg: MergeMicroConfig | None = None) -> BenchmarkReport:
    cfg = cfg or MergeMicroConfig()
    root = tempfile.mkdtemp(prefix="lhbench_merge_micro_") + "/t"
    runner = BenchmarkRunner(spark, iterations=1)
    report = BenchmarkReport(benchmark_id="merge-micro", specs={"rows": str(cfg.rows)})

    base = gen_table(spark, cfg.rows, cfg.num_splits)
    load_res = runner.run_query(
        "load",
        lambda: ManagedTable.create(
            spark, root, base, cluster_by=("key",), num_files=cfg.num_files
        ).detail(),
    )
    if load_res.error_msg:
        raise RuntimeError(f"merge-micro: load failed: {load_res.error_msg}")
    t = ManagedTable(spark, root)

    rows_now = cfg.rows
    for i in range(1, cfg.rounds + 1):
        src = update_set(t.read(), rows_now, cfg.update_pct, cfg.insert_rows, cfg.seed + i)
        # rand() makes duplicate keys impossible here (base keys are unique)
        runner.run_query(
            f"merge-{i}", lambda s=src: _merge_as_df(t, s)
        )
        rows_now += cfg.insert_rows
        # post-merge read queries (MergeMicroBenchmark.scala:253-265 shape)
        runner.run_query(
            f"read-agg-{i}",
            lambda: t.read().agg(
                F.max("key").alias("max_key"), F.count(F.lit(1)).alias("cnt")
            ),
        )
        runner.run_query(
            f"read-filter-{i}",
            lambda: t.read().filter(F.col("value") < 0).agg(
                F.count(F.lit(1)).alias("updated_rows")
            ),
        )

    report.query_results = runner.results
    for name, sec in runner.medians().items():
        report.report_extra_metric(f"{name}-seconds", sec)
    return report


def _merge_as_df(t: ManagedTable, src: DataFrame) -> DataFrame:
    metrics = t.merge(src, on=["key"], validate_unique=False)
    return t.spark.createDataFrame(
        [tuple(metrics.values())], list(metrics.keys())
    )


if __name__ == "__main__":
    from lhbench_spark.session import get_spark

    rep = run(get_spark("merge_micro"))
    print(rep.to_json())
