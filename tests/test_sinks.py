"""Hive-style partitioned writer sink: layout + round-trip + pruning."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from lhbench_spark import sinks
from lhbench_spark.catalog import table
from tests.conftest import SMOKE_SF


def test_partitioned_write_roundtrip_and_pruning(spark):
    li = table(spark, SMOKE_SF, "lineitem")
    with tempfile.TemporaryDirectory(prefix="lhbench_sink_") as d:
        path = f"{d}/li"
        sinks.write_partitioned(
            li, path, partition_by=("l_returnflag",), sort_within=("l_orderkey",)
        )
        # Hive layout on disk
        dirs = sorted(n for n in os.listdir(path) if n.startswith("l_returnflag="))
        assert len(dirs) >= 2

        back = sinks.read_partitioned(spark, path)
        assert back.count() == li.count()
        # partition pruning: filtering on the partition col scans only its dir
        one = back.filter(F.col("l_returnflag") == "A")
        files = {r[0] for r in one.select(F.input_file_name()).distinct().collect()}
        assert files and all("l_returnflag=A" in f for f in files)

        # values survive the round trip (partition col re-attached)
        a_src = li.filter(F.col("l_returnflag") == "A").count()
        assert one.count() == a_src


def test_files_per_partition_bounds_output(spark):
    li = table(spark, SMOKE_SF, "lineitem")
    with tempfile.TemporaryDirectory(prefix="lhbench_sink_") as d:
        path = f"{d}/li"
        sinks.write_partitioned(
            li, path, partition_by=("l_linestatus",), files_per_partition=2
        )
        back = sinks.read_partitioned(spark, path)
        for status_dir in os.listdir(path):
            if not status_dir.startswith("l_linestatus="):
                continue
            n = len(
                [f for f in os.listdir(f"{path}/{status_dir}") if f.endswith(".parquet")]
            )
            assert 1 <= n <= 2, f"{status_dir} has {n} files"
        assert back.count() == li.count()
