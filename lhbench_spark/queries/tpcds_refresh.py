"""Gate queries for the multi-fact TPC-DS refresh pipeline
(workloads/refresh_tpcds.py): each fact's CSV-staged delta folded
through its join-dense refresh view, plus the post-MERGE table state —
all oracle-paired against the dual-dialect generated tables.

Reference: TPCDSRefreshSchema.scala:566-845 (the per-fact refresh
views), IncrementalTPCDSBenchmark.scala:259-283 (the merge loop),
:430-440 (explicit-schema pipe CSV staging reads).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from lhbench_spark.queries.registry import query
from lhbench_spark.tables import ManagedTable
from lhbench_spark.tpcds_data import compose_oracle
from lhbench_spark.workloads import refresh_tpcds as rt
from lhbench_spark.workloads.refresh import read_staging_csv, write_staging_csv


def _staged_delta(spark, sf_dir, fact):
    """Round-1 delta through the CSV round-trip (write pipe-delimited
    headerless, read back with the explicit schema) — any staging
    fidelity loss fails the oracle compare."""
    work = tempfile.mkdtemp(prefix="lhbench_mrv_")
    write_staging_csv(rt.stage_delta(spark, sf_dir, fact, 1), f"{work}/d")
    return read_staging_csv(
        spark, f"{work}/d", rt.staging_schema(spark, sf_dir, fact)
    )


_SSV_ORACLE = compose_oracle("""
WITH delta AS (
  SELECT ss_sold_date_sk, ss_store_sk, ss_item_sk, ss_customer_sk,
         ss_quantity + 100 AS ss_quantity, ss_ext_sales_price, ss_net_profit
  FROM store_sales WHERE ss_ticket_number % 7 = 1
), rv AS (
  SELECT COALESCE(d.d_year, 0) AS sale_year,
         COALESCE(s.s_state, 'UNKNOWN') AS store_state,
         COALESCE(i.i_category, 'UNKNOWN') AS category,
         dl.ss_quantity AS quantity,
         dl.ss_ext_sales_price AS ext_sales,
         dl.ss_net_profit AS net_profit
  FROM delta dl
  LEFT JOIN date_dim d ON dl.ss_sold_date_sk = d.d_date_sk
  LEFT JOIN store s ON dl.ss_store_sk = s.s_store_sk
  LEFT JOIN item i ON dl.ss_item_sk = i.i_item_sk
)
SELECT sale_year, store_state, category, COUNT(*) AS cnt,
       CAST(SUM(quantity) AS BIGINT) AS qty_sum,
       CAST(SUM(ext_sales) AS DOUBLE) AS sales_sum,
       CAST(SUM(net_profit) AS DOUBLE) AS profit_sum
FROM rv GROUP BY sale_year, store_state, category
""")


@query(
    "tpcds_refresh_ssv_view",
    tags=("tpcds", "refresh", "csv", "staging"),
    oracle=_SSV_ORACLE,
)
def tpcds_refresh_ssv_view(spark, sf_dir):
    """store_sales refresh view over the CSV-staged delta (the ssv
    shape): delta → date_dim → store → item → customer → address chain,
    aggregated by year × store-state × category. NULL fact FKs surface
    as the UNKNOWN/0 buckets, checking outer-join semantics through the
    staging round-trip."""
    d = _staged_delta(spark, sf_dir, "store_sales")
    rv = rt.ssv_view(
        d,
        rt._dim(spark, sf_dir, "date_dim"),
        rt._dim(spark, sf_dir, "store"),
        rt._dim(spark, sf_dir, "item"),
        rt._dim(spark, sf_dir, "customer"),
        rt._dim(spark, sf_dir, "customer_address"),
    )
    return rv.groupBy("sale_year", "store_state", "category").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("quantity").cast("bigint").alias("qty_sum"),
        F.sum("ext_sales").cast("double").alias("sales_sum"),
        F.sum("net_profit").cast("double").alias("profit_sum"),
    )


_WSV_ORACLE = compose_oracle("""
WITH delta AS (
  SELECT ws_sold_date_sk, ws_item_sk, ws_bill_customer_sk,
         ws_quantity + 100 AS ws_quantity, ws_ext_sales_price
  FROM web_sales WHERE ws_order_number % 7 = 1
), rv AS (
  SELECT COALESCE(d.d_year, 0) AS sale_year,
         COALESCE(i.i_category, 'UNKNOWN') AS category,
         COALESCE(ca.ca_state, 'UNKNOWN') AS cust_state,
         dl.ws_quantity AS quantity,
         dl.ws_ext_sales_price AS ext_sales
  FROM delta dl
  LEFT JOIN date_dim d ON dl.ws_sold_date_sk = d.d_date_sk
  LEFT JOIN item i ON dl.ws_item_sk = i.i_item_sk
  LEFT JOIN customer c ON dl.ws_bill_customer_sk = c.c_customer_sk
  LEFT JOIN customer_address ca ON c.c_current_addr_sk = ca.ca_address_sk
)
SELECT sale_year, category, cust_state, COUNT(*) AS cnt,
       CAST(SUM(quantity) AS BIGINT) AS qty_sum,
       CAST(SUM(ext_sales) AS DOUBLE) AS sales_sum
FROM rv GROUP BY sale_year, category, cust_state
""")


@query(
    "tpcds_refresh_wsv_view",
    tags=("tpcds", "refresh", "csv", "staging"),
    oracle=_WSV_ORACLE,
)
def tpcds_refresh_wsv_view(spark, sf_dir):
    """web_sales refresh view (the wsv shape): delta → date_dim → item →
    bill customer → current address, aggregated by year × category ×
    customer state."""
    d = _staged_delta(spark, sf_dir, "web_sales")
    rv = rt.wsv_view(
        d,
        rt._dim(spark, sf_dir, "date_dim"),
        rt._dim(spark, sf_dir, "item"),
        rt._dim(spark, sf_dir, "customer"),
        rt._dim(spark, sf_dir, "customer_address"),
    )
    return rv.groupBy("sale_year", "category", "cust_state").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("quantity").cast("bigint").alias("qty_sum"),
        F.sum("ext_sales").cast("double").alias("sales_sum"),
    )


_CSV_ORACLE = compose_oracle("""
WITH delta AS (
  SELECT cs_sold_date_sk, cs_item_sk, cs_bill_cdemo_sk,
         1 AS cs_promo_sk,
         cs_quantity + 100 AS cs_quantity, cs_ext_sales_price
  FROM catalog_sales WHERE cs_order_number % 7 = 1
), rv AS (
  SELECT COALESCE(d.d_year, 0) AS sale_year,
         COALESCE(i.i_category, 'UNKNOWN') AS category,
         COALESCE(cd.cd_education_status, 'UNKNOWN') AS education,
         COALESCE(p.p_channel_email, 'N') AS promo_email,
         dl.cs_quantity AS quantity,
         dl.cs_ext_sales_price AS ext_sales
  FROM delta dl
  LEFT JOIN date_dim d ON dl.cs_sold_date_sk = d.d_date_sk
  LEFT JOIN item i ON dl.cs_item_sk = i.i_item_sk
  LEFT JOIN customer_demographics cd ON dl.cs_bill_cdemo_sk = cd.cd_demo_sk
  LEFT JOIN promotion p ON dl.cs_promo_sk = p.p_promo_sk
)
SELECT sale_year, category, education, promo_email, COUNT(*) AS cnt,
       CAST(SUM(quantity) AS BIGINT) AS qty_sum,
       CAST(SUM(ext_sales) AS DOUBLE) AS sales_sum
FROM rv GROUP BY sale_year, category, education, promo_email
""")


@query(
    "tpcds_refresh_csv_view",
    tags=("tpcds", "refresh", "csv", "staging"),
    oracle=_CSV_ORACLE,
)
def tpcds_refresh_csv_view(spark, sf_dir):
    """catalog_sales refresh view (the crv/csv shape): delta → date_dim
    → item → bill demographics → promotion (the round re-points every
    delta row at promo 1, so promo_email reflects promotion #1)."""
    d = _staged_delta(spark, sf_dir, "catalog_sales")
    rv = rt.csv_view(
        d,
        rt._dim(spark, sf_dir, "date_dim"),
        rt._dim(spark, sf_dir, "item"),
        rt._dim(spark, sf_dir, "customer_demographics"),
        rt._dim(spark, sf_dir, "promotion"),
    )
    return rv.groupBy("sale_year", "category", "education", "promo_email").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("quantity").cast("bigint").alias("qty_sum"),
        F.sum("ext_sales").cast("double").alias("sales_sum"),
    )


_SRV_ORACLE = compose_oracle("""
WITH delta AS (
  SELECT sr_returned_date_sk, sr_store_sk, sr_item_sk, sr_reason_sk,
         sr_return_quantity + 100 AS sr_return_quantity,
         sr_return_amt, sr_net_loss
  FROM store_returns WHERE sr_ticket_number % 7 = 1
), rv AS (
  SELECT COALESCE(d.d_year, 0) AS sale_year,
         COALESCE(s.s_state, 'UNKNOWN') AS store_state,
         COALESCE(i.i_category, 'UNKNOWN') AS category,
         COALESCE(r.r_reason_desc, 'UNKNOWN') AS reason,
         dl.sr_return_quantity AS quantity,
         dl.sr_return_amt AS ret_amt,
         dl.sr_net_loss AS net_loss
  FROM delta dl
  LEFT JOIN date_dim d ON dl.sr_returned_date_sk = d.d_date_sk
  LEFT JOIN store s ON dl.sr_store_sk = s.s_store_sk
  LEFT JOIN item i ON dl.sr_item_sk = i.i_item_sk
  LEFT JOIN reason r ON dl.sr_reason_sk = r.r_reason_sk
)
SELECT sale_year, store_state, category, reason, COUNT(*) AS cnt,
       CAST(SUM(quantity) AS BIGINT) AS qty_sum,
       CAST(SUM(ret_amt) AS DOUBLE) AS ret_sum,
       CAST(SUM(net_loss) AS DOUBLE) AS loss_sum
FROM rv GROUP BY sale_year, store_state, category, reason
""")


@query(
    "tpcds_refresh_srv_view",
    tags=("tpcds", "refresh", "csv", "staging", "returns"),
    oracle=_SRV_ORACLE,
)
def tpcds_refresh_srv_view(spark, sf_dir):
    """store_returns refresh view (the srv shape): delta → date_dim →
    store → item → reason, aggregated by year × store-state × category ×
    return reason — the returns-family representative of the seven-fact
    refresh breadth."""
    d = _staged_delta(spark, sf_dir, "store_returns")
    rv = rt.srv_view(
        d,
        rt._dim(spark, sf_dir, "date_dim"),
        rt._dim(spark, sf_dir, "store"),
        rt._dim(spark, sf_dir, "item"),
        rt._dim(spark, sf_dir, "reason"),
    )
    return rv.groupBy("sale_year", "store_state", "category", "reason").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("quantity").cast("bigint").alias("qty_sum"),
        F.sum("ret_amt").cast("double").alias("ret_sum"),
        F.sum("net_loss").cast("double").alias("loss_sum"),
    )


_IV_ORACLE = compose_oracle("""
WITH delta AS (
  SELECT inv_date_sk, inv_item_sk, inv_warehouse_sk,
         inv_quantity_on_hand + 100 AS inv_quantity_on_hand
  FROM inventory WHERE inv_date_sk % 7 = 1
), rv AS (
  SELECT COALESCE(d.d_year, 0) AS inv_year,
         COALESCE(i.i_category, 'UNKNOWN') AS category,
         COALESCE(w.w_state, 'UNKNOWN') AS wh_state,
         dl.inv_quantity_on_hand AS qoh
  FROM delta dl
  LEFT JOIN date_dim d ON dl.inv_date_sk = d.d_date_sk
  LEFT JOIN item i ON dl.inv_item_sk = i.i_item_sk
  LEFT JOIN warehouse w ON dl.inv_warehouse_sk = w.w_warehouse_sk
)
SELECT inv_year, category, wh_state, COUNT(*) AS cnt,
       CAST(SUM(qoh) AS BIGINT) AS qoh_sum
FROM rv GROUP BY inv_year, category, wh_state
""")


@query(
    "tpcds_refresh_iv_view",
    tags=("tpcds", "refresh", "csv", "staging", "inventory"),
    oracle=_IV_ORACLE,
)
def tpcds_refresh_iv_view(spark, sf_dir):
    """inventory refresh view (the iv shape): delta → date_dim → item →
    warehouse, aggregated by year × category × warehouse state. The
    only fact with a 3-column natural key ((date, item, warehouse) —
    the surrogate fold covers it) and a non-money measure."""
    d = _staged_delta(spark, sf_dir, "inventory")
    rv = rt.iv_view(
        d,
        rt._dim(spark, sf_dir, "date_dim"),
        rt._dim(spark, sf_dir, "item"),
        rt._dim(spark, sf_dir, "warehouse"),
    )
    return rv.groupBy("inv_year", "category", "wh_state").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("qoh").cast("bigint").alias("qoh_sum"),
    )


_MERGED_ORACLE = compose_oracle("""
WITH merged AS (
  SELECT ss_ticket_number, ss_quantity + 100 AS ss_quantity,
         ss_ext_sales_price
  FROM store_sales WHERE ss_ticket_number % 7 = 1
  UNION ALL
  SELECT ss_ticket_number, ss_quantity, ss_ext_sales_price
  FROM store_sales WHERE NOT ss_ticket_number % 7 = 1
)
SELECT (ss_ticket_number % 7 = 1) AS refreshed, COUNT(*) AS cnt,
       CAST(SUM(ss_quantity) AS BIGINT) AS qty_sum,
       CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS sales_sum
FROM merged GROUP BY (ss_ticket_number % 7 = 1)
""")


@query(
    "tpcds_refresh_merged_state",
    tags=("tpcds", "refresh", "merge", "dml", "managed-table"),
    oracle=_MERGED_ORACLE,
)
def tpcds_refresh_merged_state(spark, sf_dir):
    """One full refresh round on the managed store_sales table: base
    load (key-clustered CoW), CSV-staged delta, MERGE on the surrogate
    key, then the table STATE aggregated by refreshed-slice — the oracle
    recomputes the upsert relationally, so merge bookkeeping is
    value-checked end-to-end (every delta key exists in the base, so the
    upsert reduces to slice replacement)."""
    base = rt.fact_with_key(spark, sf_dir, "store_sales")
    root = tempfile.mkdtemp(prefix="lhbench_mstate_") + "/ss"
    t = ManagedTable.create(spark, root, base, cluster_by=("ss_key",), num_files=8)
    delta = _staged_delta(spark, sf_dir, "store_sales")
    keyed = delta.select(rt._key_col("store_sales"), *delta.columns).select(
        *t.read().columns
    )
    t.merge(keyed, on=["ss_key"], validate_unique=False)
    return (
        t.read()
        .withColumn("refreshed", (F.col("ss_ticket_number") % 7) == 1)
        .groupBy("refreshed")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("ss_quantity").cast("bigint").alias("qty_sum"),
            F.sum("ss_ext_sales_price").cast("double").alias("sales_sum"),
        )
    )
