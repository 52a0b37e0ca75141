"""Multi-fact TPC-DS refresh pipeline — the reference's refresh BREADTH.

The reference's incremental benchmark stages ~20 refresh flat-files per
round and folds them through 7 join-dense views into 7 fact tables
(TPCDSRefreshSchema.scala:24-561 staging schemas, :566-845 the
crv/csv/iv/srv/ssv/wrv/wsv views; merge loop
IncrementalTPCDSBenchmark.scala:259-283). The TPC-H-shaped refresh
workload (refresh.py) reaches the reference's join DENSITY on one fact
pair; this module reaches its BREADTH: the reference's full seven fact
tables (store_sales / web_sales / catalog_sales / store_returns /
web_returns / catalog_returns / inventory, matching the ssv / wsv / csv
/ srv / wrv / crv / iv view roster of TPCDSRefreshSchema.scala:566-845),
each with its own staged CSV delta, its own join-dense refresh view
through its own dimension chain, and its own MERGE per round.

Scale notes (same discipline as refresh.py): staging scans are
explicit-schema CSV (no inference job); each view is left-outer joins
where only AQE decides dimension strategy (deltas are the small side
after a round — forced dim broadcasts would OOM at 100×); merges are
file-level CoW on key-clustered tables, cost O(touched files + delta).
"""

from __future__ import annotations

import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lhbench_spark.functions.numeric import dsum
from lhbench_spark.harness import BenchmarkReport, BenchmarkRunner
from lhbench_spark.tables import ManagedTable
from lhbench_spark.tpcds_data import generate_frame, materialize
from lhbench_spark.workloads.refresh import read_staging_csv, write_staging_csv

# Surrogate upsert key per fact: the natural key's columns folded
# base-10000 (items within one ticket/order are distinct by
# construction; warehouse count << 10000) — the single-column merge key
# the manifest table clusters on, like refresh.py's l_linekey. `bump`
# is the integer measure each refresh round increments by 100 (the
# dsdgen refresh-file analog, CSV-exact, decimal-rule-free); `measure`
# is the view column the per-round view query aggregates.
FACTS: dict[str, dict] = {
    "store_sales": {
        "prefix": "ss",
        "key": ("ss_ticket_number", "ss_item_sk"),
        "slice_col": "ss_ticket_number",
        "bump": "ss_quantity",
        "measure": "ext_sales",
    },
    "web_sales": {
        "prefix": "ws",
        "key": ("ws_order_number", "ws_item_sk"),
        "slice_col": "ws_order_number",
        "bump": "ws_quantity",
        "measure": "ext_sales",
    },
    "catalog_sales": {
        "prefix": "cs",
        "key": ("cs_order_number", "cs_item_sk"),
        "slice_col": "cs_order_number",
        "bump": "cs_quantity",
        "measure": "ext_sales",
    },
    "store_returns": {
        "prefix": "sr",
        "key": ("sr_ticket_number", "sr_item_sk"),
        "slice_col": "sr_ticket_number",
        "bump": "sr_return_quantity",
        "measure": "ret_amt",
    },
    "web_returns": {
        "prefix": "wr",
        "key": ("wr_order_number", "wr_item_sk"),
        "slice_col": "wr_order_number",
        "bump": "wr_return_quantity",
        "measure": "ret_amt",
    },
    "catalog_returns": {
        "prefix": "cr",
        "key": ("cr_order_number", "cr_item_sk"),
        "slice_col": "cr_order_number",
        "bump": "cr_return_quantity",
        "measure": "ret_amt",
    },
    "inventory": {
        "prefix": "inv",
        "key": ("inv_date_sk", "inv_item_sk", "inv_warehouse_sk"),
        "slice_col": "inv_date_sk",
        "bump": "inv_quantity_on_hand",
        "measure": "qoh",
    },
}


def _key_col(fact: str) -> F.Column:
    cols = FACTS[fact]["key"]
    # bigint fold: int32 components (inventory's date_sk ~2.45M) overflow
    # at the first ×10000 otherwise
    expr = F.col(cols[0]).cast("bigint")
    for c in cols[1:]:
        expr = expr * 10000 + F.col(c).cast("bigint")
    return expr.alias(f"{FACTS[fact]['prefix']}_key")


def fact_frame(spark: SparkSession, sf_dir: str, fact: str) -> DataFrame:
    """The generated fact read from its materialized parquet."""
    out = materialize(spark, sf_dir)
    return spark.read.parquet(f"{out}/{fact}")


def fact_with_key(spark: SparkSession, sf_dir: str, fact: str) -> DataFrame:
    df = fact_frame(spark, sf_dir, fact)
    return df.select(_key_col(fact), *df.columns)


def stage_delta(
    spark: SparkSession, sf_dir: str, fact: str, round_no: int
) -> DataFrame:
    """One refresh round's delta for one fact: the slice of whole
    tickets/orders (dates for inventory) with number ≡ round (mod 7),
    the fact's integer measure bumped by 100 (CSV-exact,
    decimal-rule-free) and — where the fact has one — promo re-pointed;
    the dsdgen refresh-file analog, raw fact shape (no surrogate key;
    the key is derived after the staged read, like dsdgen's)."""
    meta = FACTS[fact]
    df = fact_frame(spark, sf_dir, fact)
    out = df.filter((F.col(meta["slice_col"]) % 7) == (round_no % 7)).withColumn(
        meta["bump"], F.col(meta["bump"]) + 100
    )
    promo = f"{meta['prefix']}_promo_sk"
    if promo in df.columns:
        out = out.withColumn(promo, F.lit(1))
    return out


def staging_schema(spark: SparkSession, sf_dir: str, fact: str):
    """Explicit staging StructType = the fact's own schema (all columns
    CSV-safe: int/bigint/decimal; no inference pass at read)."""
    return fact_frame(spark, sf_dir, fact).schema


def _dim(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    out = materialize(spark, sf_dir)
    return spark.read.parquet(f"{out}/{name}")


def ssv_view(delta: DataFrame, date_dim, store, item, customer, address) -> DataFrame:
    """store_sales refresh view (the ssv shape): delta → date_dim →
    store → item → customer → current address, derived measures. 5
    left-outer joins; no hints — AQE sizes every side."""
    return (
        delta.join(date_dim, delta.ss_sold_date_sk == date_dim.d_date_sk, "left")
        .join(store, delta.ss_store_sk == store.s_store_sk, "left")
        .join(item, delta.ss_item_sk == item.i_item_sk, "left")
        .join(customer, delta.ss_customer_sk == customer.c_customer_sk, "left")
        .join(address, customer.c_current_addr_sk == address.ca_address_sk, "left")
        .select(
            F.coalesce(date_dim.d_year, F.lit(0)).alias("sale_year"),
            F.coalesce(store.s_state, F.lit("UNKNOWN")).alias("store_state"),
            F.coalesce(item.i_category, F.lit("UNKNOWN")).alias("category"),
            F.coalesce(address.ca_state, F.lit("UNKNOWN")).alias("cust_state"),
            F.col("ss_quantity").alias("quantity"),
            F.col("ss_ext_sales_price").alias("ext_sales"),
            F.col("ss_net_profit").alias("net_profit"),
        )
    )


def wsv_view(delta: DataFrame, date_dim, item, customer, address) -> DataFrame:
    """web_sales refresh view (the wsv shape): delta → date_dim → item →
    bill customer → current address."""
    return (
        delta.join(date_dim, delta.ws_sold_date_sk == date_dim.d_date_sk, "left")
        .join(item, delta.ws_item_sk == item.i_item_sk, "left")
        .join(customer, delta.ws_bill_customer_sk == customer.c_customer_sk, "left")
        .join(address, customer.c_current_addr_sk == address.ca_address_sk, "left")
        .select(
            F.coalesce(date_dim.d_year, F.lit(0)).alias("sale_year"),
            F.coalesce(item.i_category, F.lit("UNKNOWN")).alias("category"),
            F.coalesce(address.ca_state, F.lit("UNKNOWN")).alias("cust_state"),
            F.col("ws_quantity").alias("quantity"),
            F.col("ws_ext_sales_price").alias("ext_sales"),
        )
    )


def csv_view(delta: DataFrame, date_dim, item, cdemo, promotion) -> DataFrame:
    """catalog_sales refresh view (the crv/csv shape): delta → date_dim
    → item → bill demographics → promotion."""
    return (
        delta.join(date_dim, delta.cs_sold_date_sk == date_dim.d_date_sk, "left")
        .join(item, delta.cs_item_sk == item.i_item_sk, "left")
        .join(cdemo, delta.cs_bill_cdemo_sk == cdemo.cd_demo_sk, "left")
        .join(promotion, delta.cs_promo_sk == promotion.p_promo_sk, "left")
        .select(
            F.coalesce(date_dim.d_year, F.lit(0)).alias("sale_year"),
            F.coalesce(item.i_category, F.lit("UNKNOWN")).alias("category"),
            F.coalesce(cdemo.cd_education_status, F.lit("UNKNOWN")).alias("education"),
            F.coalesce(promotion.p_channel_email, F.lit("N")).alias("promo_email"),
            F.col("cs_quantity").alias("quantity"),
            F.col("cs_ext_sales_price").alias("ext_sales"),
        )
    )


def srv_view(delta: DataFrame, date_dim, store, item, reason) -> DataFrame:
    """store_returns refresh view (the srv shape): delta → date_dim →
    store → item → reason."""
    return (
        delta.join(date_dim, delta.sr_returned_date_sk == date_dim.d_date_sk, "left")
        .join(store, delta.sr_store_sk == store.s_store_sk, "left")
        .join(item, delta.sr_item_sk == item.i_item_sk, "left")
        .join(reason, delta.sr_reason_sk == reason.r_reason_sk, "left")
        .select(
            F.coalesce(date_dim.d_year, F.lit(0)).alias("sale_year"),
            F.coalesce(store.s_state, F.lit("UNKNOWN")).alias("store_state"),
            F.coalesce(item.i_category, F.lit("UNKNOWN")).alias("category"),
            F.coalesce(reason.r_reason_desc, F.lit("UNKNOWN")).alias("reason"),
            F.col("sr_return_quantity").alias("quantity"),
            F.col("sr_return_amt").alias("ret_amt"),
            F.col("sr_net_loss").alias("net_loss"),
        )
    )


def wrv_view(delta: DataFrame, date_dim, item, customer, address) -> DataFrame:
    """web_returns refresh view (the wrv shape): delta → date_dim → item
    → returning customer → returning address."""
    return (
        delta.join(date_dim, delta.wr_returned_date_sk == date_dim.d_date_sk, "left")
        .join(item, delta.wr_item_sk == item.i_item_sk, "left")
        .join(
            customer,
            delta.wr_returning_customer_sk == customer.c_customer_sk,
            "left",
        )
        .join(address, delta.wr_returning_addr_sk == address.ca_address_sk, "left")
        .select(
            F.coalesce(date_dim.d_year, F.lit(0)).alias("sale_year"),
            F.coalesce(item.i_category, F.lit("UNKNOWN")).alias("category"),
            F.coalesce(address.ca_state, F.lit("UNKNOWN")).alias("ret_state"),
            F.col("wr_return_quantity").alias("quantity"),
            F.col("wr_return_amt").alias("ret_amt"),
        )
    )


def crv_view(delta: DataFrame, date_dim, item, customer) -> DataFrame:
    """catalog_returns refresh view (the crv shape): delta → date_dim →
    item → returning customer."""
    return (
        delta.join(date_dim, delta.cr_returned_date_sk == date_dim.d_date_sk, "left")
        .join(item, delta.cr_item_sk == item.i_item_sk, "left")
        .join(
            customer,
            delta.cr_returning_customer_sk == customer.c_customer_sk,
            "left",
        )
        .select(
            F.coalesce(date_dim.d_year, F.lit(0)).alias("sale_year"),
            F.coalesce(item.i_category, F.lit("UNKNOWN")).alias("category"),
            F.coalesce(customer.c_birth_country, F.lit("UNKNOWN")).alias("country"),
            F.col("cr_return_quantity").alias("quantity"),
            F.col("cr_return_amount").alias("ret_amt"),
        )
    )


def iv_view(delta: DataFrame, date_dim, item, warehouse) -> DataFrame:
    """inventory refresh view (the iv shape): delta → date_dim → item →
    warehouse; the measure is quantity-on-hand (no money column)."""
    return (
        delta.join(date_dim, delta.inv_date_sk == date_dim.d_date_sk, "left")
        .join(item, delta.inv_item_sk == item.i_item_sk, "left")
        .join(warehouse, delta.inv_warehouse_sk == warehouse.w_warehouse_sk, "left")
        .select(
            F.coalesce(date_dim.d_year, F.lit(0)).alias("inv_year"),
            F.coalesce(item.i_category, F.lit("UNKNOWN")).alias("category"),
            F.coalesce(warehouse.w_state, F.lit("UNKNOWN")).alias("wh_state"),
            F.col("inv_quantity_on_hand").alias("qoh"),
        )
    )


@dataclass
class MultiRefreshConfig:
    rounds: int = 10


def run(
    spark: SparkSession, sf_dir: str, cfg: MultiRefreshConfig | None = None
) -> BenchmarkReport:
    """Base-load the seven managed fact tables, then per round: stage
    the seven CSV deltas, time each fact's refresh view, MERGE each
    delta — the reference's refresh loop at full seven-fact breadth
    (IncrementalTPCDSBenchmark.scala:259-283)."""
    cfg = cfg or MultiRefreshConfig()
    runner = BenchmarkRunner(spark, iterations=1)
    report = BenchmarkReport(
        benchmark_id="refresh-tpcds",
        specs={"rounds": str(cfg.rounds), "facts": str(len(FACTS))},
    )
    work = tempfile.mkdtemp(prefix="lhbench_mrefresh_")

    tables: dict[str, ManagedTable] = {}
    for fact, meta in FACTS.items():
        base = fact_with_key(spark, sf_dir, fact)
        key = f"{meta['prefix']}_key"
        res = runner.run_query(
            f"load-{fact}",
            lambda b=base, f=fact, k=key: ManagedTable.create(
                spark, f"{work}/{f}", b, cluster_by=(k,), num_files=8
            ).detail(),
        )
        if res.error_msg:
            raise RuntimeError(f"refresh_tpcds: load {fact} failed: {res.error_msg}")
        tables[fact] = ManagedTable(spark, f"{work}/{fact}")

    dd = _dim(spark, sf_dir, "date_dim")
    store = _dim(spark, sf_dir, "store")
    item = _dim(spark, sf_dir, "item")
    cust = _dim(spark, sf_dir, "customer")
    addr = _dim(spark, sf_dir, "customer_address")
    cdemo = _dim(spark, sf_dir, "customer_demographics")
    promo = _dim(spark, sf_dir, "promotion")
    reason = _dim(spark, sf_dir, "reason")
    wh = _dim(spark, sf_dir, "warehouse")

    views = {
        "store_sales": lambda d: ssv_view(d, dd, store, item, cust, addr),
        "web_sales": lambda d: wsv_view(d, dd, item, cust, addr),
        "catalog_sales": lambda d: csv_view(d, dd, item, cdemo, promo),
        "store_returns": lambda d: srv_view(d, dd, store, item, reason),
        "web_returns": lambda d: wrv_view(d, dd, item, cust, addr),
        "catalog_returns": lambda d: crv_view(d, dd, item, cust),
        "inventory": lambda d: iv_view(d, dd, item, wh),
    }

    for i in range(1, cfg.rounds + 1):
        for fact, meta in FACTS.items():
            sdir = f"{work}/stage/{fact}_{i}"
            write_staging_csv(stage_delta(spark, sf_dir, fact, i), sdir)
            schema = staging_schema(spark, sf_dir, fact)

            def view_round(sdir=sdir, schema=schema, fact=fact, meta=meta):
                delta = read_staging_csv(spark, sdir, schema)
                return views[fact](delta).agg(
                    F.count(F.lit(1)).alias("cnt"),
                    dsum(meta["measure"]).alias("measure_sum"),
                )

            runner.run_query(f"view-{fact}-{i}", view_round)

            def merge_round(sdir=sdir, schema=schema, fact=fact, meta=meta):
                t = tables[fact]
                delta = read_staging_csv(spark, sdir, schema)
                keyed = delta.select(_key_col(fact), *delta.columns).select(
                    *t.read().columns
                )
                m = t.merge(
                    keyed, on=[f"{meta['prefix']}_key"], validate_unique=False
                )
                return spark.createDataFrame([tuple(m.values())], list(m.keys()))

            runner.run_query(f"merge-{fact}-{i}", merge_round)

    for fact in FACTS:
        runner.run_query(
            f"compact-{fact}",
            lambda f=fact: (
                tables[f].optimize(target_file_rows=2_000_000),
                tables[f].detail(),
            )[1],
        )

    report.query_results = runner.results
    for name, sec in runner.medians().items():
        report.report_extra_metric(f"{name}-seconds", sec)
    return report


if __name__ == "__main__":
    import os

    from lhbench_spark.session import get_spark

    rep = run(
        get_spark("refresh-tpcds"),
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    print(rep.to_json())
