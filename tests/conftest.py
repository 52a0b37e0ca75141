"""Shared fixtures: one SparkSession per test run + the DuckDB oracle."""

from __future__ import annotations

import duckdb
import pytest

from lhbench_spark.catalog import TABLES
from lhbench_spark.session import get_spark

SMOKE_SF = "/root/testdata/sf0.001"
ORACLE_SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("lhbench-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def oracle():
    """DuckDB connection with the testdata tables registered as views,
    matching the driver's oracle environment."""
    con = duckdb.connect()

    def make(sf_dir: str) -> duckdb.DuckDBPyConnection:
        for t in TABLES:
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con

    yield make
    con.close()
