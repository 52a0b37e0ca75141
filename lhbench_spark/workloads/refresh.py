"""Incremental refresh pipeline: CSV staging ingest → join-dense refresh
view → MERGE rounds → before/after queries → compaction.

Analog of the reference's incremental TPC-DS benchmark
(reference: IncrementalTPCDSBenchmark.scala:97-351): staging flat files
are pipe-delimited, headerless CSV read with an EXPLICIT StructType
(:422-443 — no inference, char(N) normalized to string), the refresh
content is produced by a join-dense view over the staged deltas
(TPCDSRefreshSchema.scala:566-845 — the 7 crv/csv/…/wsv views), each
round MERGEs the delta into the base table on its key (:259-283), and
the same read queries run before and after the merge rounds (:119).

Scale notes: the CSV scan is schema-declared (no inference pass), the
refresh view is one shuffle per fact-fact join with dimension sides
broadcast, and the MERGE is file-level CoW on a range-clustered table.
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lhbench_spark.catalog import table
from lhbench_spark.functions.numeric import dsum
from lhbench_spark.harness import BenchmarkReport, BenchmarkRunner
from lhbench_spark.tables import ManagedTable

# Explicit staging schemas (IncrementalTPCDSBenchmark.scala:430-440 read
# path; TPCDSRefreshSchema.scala StructType style). Timestamps travel as
# formatted strings — the reference's dsdgen files are all text, and
# char(N)→string normalization applies (:436-437).
LINEITEM_STAGING_SCHEMA = StructType(
    [
        StructField("l_orderkey", LongType()),
        StructField("l_partkey", LongType()),
        StructField("l_suppkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_discount", DoubleType()),
        StructField("l_tax", DoubleType()),
        StructField("l_returnflag", StringType()),
        StructField("l_linestatus", StringType()),
        StructField("l_shipdate_s", StringType()),
    ]
)

ORDERS_STAGING_SCHEMA = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderdate_s", StringType()),
        StructField("o_orderpriority", StringType()),
    ]
)


def write_staging_csv(df: DataFrame, path: str) -> None:
    """Pipe-delimited, headerless flat files — the dsdgen format
    (IncrementalTPCDSBenchmark.scala:430-432)."""
    df.write.option("delimiter", "|").option("header", "false").csv(path)


def read_staging_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Explicit-schema CSV scan: no inference job, types declared up front."""
    return (
        spark.read.format("csv")
        .option("delimiter", "|")
        .option("header", "false")
        .schema(schema)
        .load(path)
    )


def stage_lineitem_delta(spark: SparkSession, sf_dir: str, round_no: int) -> DataFrame:
    """The delta batch for one refresh round: a deterministic slice of
    lineitem (the dsdgen refresh-file analog), typed for CSV staging."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_orderkey") % 7) == (round_no % 7)).select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        (F.col("l_extendedprice") * 1.01).alias("l_extendedprice"),
        "l_discount",
        "l_tax",
        "l_returnflag",
        F.lit("R").alias("l_linestatus"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("l_shipdate_s"),
    )


def stage_orders_delta(spark: SparkSession, sf_dir: str, round_no: int) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.filter((F.col("o_orderkey") % 7) == (round_no % 7)).select(
        "o_orderkey",
        "o_custkey",
        F.lit("R").alias("o_orderstatus"),
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
        "o_orderpriority",
    )


def refresh_view(
    li_delta: DataFrame,
    o_delta: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    supplier: DataFrame,
    region: DataFrame,
    part: DataFrame,
) -> DataFrame:
    """Join-dense refresh view at reference density (the ssv shape,
    TPCDSRefreshSchema.scala:579-613 is a 7-join left-outer chain): the
    staged fact delta left-joined through its sibling staged fact and a
    6-deep dimension chain — customer → customer-nation → region on the
    order side, supplier → supplier-nation and part on the line side —
    with derived measures (revenue, tax-inclusive charge). Broadcast
    hints only on the fixed-cardinality dims (nation both roles, region);
    customer/supplier/part strategy is AQE's. One shuffle for the
    fact-fact join; the delta never shuffles for a dimension."""
    cn = nation.select(
        F.col("n_nationkey").alias("cn_nationkey"),
        F.col("n_name").alias("cn_name"),
        F.col("n_regionkey").alias("cn_regionkey"),
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_nationkey"),
        F.col("n_name").alias("sn_name"),
    )
    return (
        li_delta.join(o_delta, li_delta.l_orderkey == o_delta.o_orderkey, "left")
        .join(customer, o_delta.o_custkey == customer.c_custkey, "left")
        .join(F.broadcast(cn), customer.c_nationkey == F.col("cn_nationkey"), "left")
        .join(F.broadcast(region), F.col("cn_regionkey") == region.r_regionkey, "left")
        .join(supplier, li_delta.l_suppkey == supplier.s_suppkey, "left")
        .join(F.broadcast(sn), supplier.s_nationkey == F.col("sn_nationkey"), "left")
        .join(part, li_delta.l_partkey == part.p_partkey, "left")
        .select(
            li_delta.l_orderkey.alias("orderkey"),
            F.col("l_linenumber").alias("linenumber"),
            F.col("l_quantity").alias("quantity"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            (
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).alias("charge"),
            F.col("o_orderpriority").alias("orderpriority"),
            F.coalesce(F.col("cn_name"), F.lit("UNKNOWN")).alias("cust_nation"),
            F.coalesce(F.col("r_name"), F.lit("UNKNOWN")).alias("cust_region"),
            F.coalesce(F.col("sn_name"), F.lit("UNKNOWN")).alias("supp_nation"),
            F.col("s_name").alias("supp_name"),
            F.coalesce(F.col("p_brand"), F.lit("UNKNOWN")).alias("brand"),
            F.to_date("l_shipdate_s").alias("shipdate"),
        )
    )


@dataclass
class RefreshConfig:
    # 10 rounds = the reference's refresh-count=10 experiment loop
    # (experiment-instructions.md:277-296)
    rounds: int = 10
    iterations: int = 1


def run(spark: SparkSession, sf_dir: str, cfg: RefreshConfig | None = None) -> BenchmarkReport:
    cfg = cfg or RefreshConfig()
    runner = BenchmarkRunner(spark, iterations=1)
    report = BenchmarkReport(benchmark_id="refresh", specs={"rounds": str(cfg.rounds)})
    work = tempfile.mkdtemp(prefix="lhbench_refresh_")

    # 1. base load (CTAS, IncrementalTPCDSBenchmark.scala:221-257)
    li = table(spark, sf_dir, "lineitem").withColumn(
        "l_linekey",
        F.col("l_orderkey") * 10 + F.col("l_linenumber"),
    )
    load_res = runner.run_query(
        "load",
        lambda: ManagedTable.create(
            spark, f"{work}/fact", li, cluster_by=("l_linekey",), num_files=16
        ).detail(),
    )
    if load_res.error_msg:
        raise RuntimeError(f"refresh workload: base load failed: {load_res.error_msg}")
    t = ManagedTable(spark, f"{work}/fact")

    def read_query() -> DataFrame:
        return (
            t.read()
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("cnt"), dsum("l_quantity").alias("qty"))
        )

    runner.run_query("queries-before", read_query)

    # 2. refresh rounds: stage CSV → schema'd scan → view → MERGE
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    supplier = table(spark, sf_dir, "supplier")
    region = table(spark, sf_dir, "region")
    part = table(spark, sf_dir, "part")
    for i in range(1, cfg.rounds + 1):
        li_dir, o_dir = f"{work}/stage/li_{i}", f"{work}/stage/o_{i}"
        write_staging_csv(stage_lineitem_delta(spark, sf_dir, i), li_dir)
        write_staging_csv(stage_orders_delta(spark, sf_dir, i), o_dir)

        # refresh-view pass per round: the reference computes the staged
        # refresh content through the join-dense views before merging
        # (TPCDSRefreshSchema.scala:566-845); time the 7-join chain here.
        def view_round(li_dir=li_dir, o_dir=o_dir) -> DataFrame:
            rv = refresh_view(
                read_staging_csv(spark, li_dir, LINEITEM_STAGING_SCHEMA),
                read_staging_csv(spark, o_dir, ORDERS_STAGING_SCHEMA),
                customer, nation, supplier, region, part,
            )
            return rv.agg(
                F.count(F.lit(1)).alias("cnt"), dsum("revenue").alias("rev")
            )

        runner.run_query(f"view-{i}", view_round)

        def merge_round(li_dir=li_dir, o_dir=o_dir) -> DataFrame:
            li_delta = read_staging_csv(spark, li_dir, LINEITEM_STAGING_SCHEMA)
            delta = li_delta.select(
                (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("l_linekey"),
                "l_orderkey",
                "l_partkey",
                "l_suppkey",
                "l_linenumber",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_tax",
                "l_returnflag",
                "l_linestatus",
                F.to_timestamp("l_shipdate_s").alias("l_shipdate"),
            ).select(*t.read().columns)
            metrics = t.merge(delta, on=["l_linekey"], validate_unique=False)
            return spark.createDataFrame([tuple(metrics.values())], list(metrics.keys()))

        runner.run_query(f"merge-{i}", merge_round)

    # 3. compaction + post-merge queries (…scala:186-204, :119)
    runner.run_query(
        "compact", lambda: (t.optimize(target_file_rows=2_000_000), t.detail())[1]
    )
    runner.run_query("queries-after", read_query)

    report.query_results = runner.results
    for name, sec in runner.medians().items():
        report.report_extra_metric(f"{name}-seconds", sec)
    return report


if __name__ == "__main__":
    from lhbench_spark.session import get_spark

    rep = run(get_spark("refresh"), os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    print(rep.to_json())


def refresh_view_parts(
    li_delta: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """Second refresh-view shape (the csv/cpv analog,
    TPCDSRefreshSchema.scala:614-845): the staged fact delta joined
    through the part AND supplier dimensions simultaneously — the
    compound-dimension chain whose join keys come from different delta
    columns. part/supplier are SF-scaled, so no forced broadcast hints —
    at bench SFs AQE broadcasts them from measured size; at 100 TB the
    delta (the small side after a refresh round) is the broadcast
    candidate, and a forced hint on the dimensions would OOM executors."""
    return (
        li_delta.join(part, li_delta.l_partkey == part.p_partkey, "left")
        .join(
            supplier,
            li_delta.l_suppkey == supplier.s_suppkey,
            "left",
        )
        .select(
            li_delta.l_orderkey.alias("orderkey"),
            F.col("l_linenumber").alias("linenumber"),
            F.coalesce(F.col("p_brand"), F.lit("UNKNOWN")).alias("brand"),
            F.coalesce(F.col("s_name"), F.lit("UNKNOWN")).alias("supp_name"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.col("l_quantity").alias("quantity"),
        )
    )
