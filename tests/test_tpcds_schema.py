"""TPC-DS schema bank round-trip tests (TPCDSDataLoad.scala:163-702
parity as data).

Every one of the 25 table specs must parse to a StructType, round-trip
through ManagedTable.create on an empty frame with byte-identical
column names/types, and carry internally-consistent key maps (PK and
partition keys name real columns)."""

from __future__ import annotations

import pytest

from lhbench_spark import tpcds

ALL = sorted(tpcds.TPCDS_TABLES)


def test_bank_is_complete():
    # the reference's 25-table load surface (24 TPC-DS tables + dbgen_version)
    assert len(ALL) == 25
    assert set(tpcds.FACT_TABLES) < set(ALL)


@pytest.mark.parametrize("name", ALL)
def test_key_maps_name_real_columns(spark, name):
    # (spark: StructType.fromDDL parses through the active session)
    spec = tpcds.TPCDS_TABLES[name]
    cols = {f.name for f in spec.struct_type().fields}
    assert set(spec.primary_keys) <= cols, spec.primary_keys
    assert set(spec.partition_keys) <= cols, spec.partition_keys
    # every fact partitions on its date surrogate; dims don't partition
    if name in tpcds.FACT_TABLES:
        assert spec.partition_keys and spec.partition_keys[0].endswith("_date_sk")
    else:
        assert not spec.partition_keys


@pytest.mark.parametrize("name", ALL)
def test_empty_frame_roundtrips_through_managed_table(spark, tmp_path, name):
    df = tpcds.empty_frame(spark, name)
    t = tpcds.create_table(spark, str(tmp_path / name), df, name)
    back = t.read()
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in df.schema.fields
    ]
    assert back.count() == 0
    assert tuple(t.primary_keys) == tpcds.TPCDS_TABLES[name].primary_keys


def test_store_sales_merge_key_works(spark, tmp_path):
    """The declared PK drives MERGE: a two-row upsert into store_sales
    updates on (ss_item_sk, ss_ticket_number) like the reference's
    refresh merges (IncrementalTPCDSBenchmark.scala:259-283)."""
    from decimal import Decimal

    schema = tpcds.struct_type("store_sales")
    row = {f.name: None for f in schema.fields}
    r1 = dict(row, ss_item_sk=1, ss_ticket_number=10, ss_quantity=5,
              ss_sold_date_sk=2450816, ss_net_paid=Decimal("10.00"))
    r2 = dict(row, ss_item_sk=2, ss_ticket_number=11, ss_quantity=7,
              ss_sold_date_sk=2450817, ss_net_paid=Decimal("20.00"))
    df = spark.createDataFrame([r1, r2], schema)
    t = tpcds.create_table(spark, str(tmp_path / "ss"), df, "store_sales")
    upd = dict(r1, ss_quantity=9)
    ins = dict(r2, ss_item_sk=3, ss_ticket_number=12)
    src = spark.createDataFrame([upd, ins], schema)
    m = t.merge(src, on=["ss_item_sk", "ss_ticket_number"])
    assert m["matched_updated"] == 1 and m["inserted"] == 1
    assert t.read().count() == 3
    got = t.read().filter("ss_item_sk = 1").collect()[0]
    assert got["ss_quantity"] == 9
