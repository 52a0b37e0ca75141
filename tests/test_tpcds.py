"""TPC-DS surface tests: generator dual-dialect parity, schema
conformance to the TPCDS_TABLES spec bank, and plan quality of the
sql-path star joins.

(The tpcds_q* query-vs-oracle checks run through the registry-driven
test_oracle_queries sweep at both SFs, like every other query.)
"""

from __future__ import annotations

import pytest

from lhbench_spark import tpcds_data as td
from lhbench_spark.tpcds import TPCDS_TABLES, struct_type
from tests.compare import compare
from tests.conftest import SMOKE_SF


@pytest.mark.parametrize("name", sorted(td.TPCDS_GEN_TABLES))
def test_generated_table_matches_duckdb_render(spark, oracle, name):
    """Every generated table must be row-identical between the Spark
    render (range+selectExpr) and the DuckDB render (CTE over range /
    orders row_numbers) — table-level parity makes any query-level
    mismatch attributable to the query text, not the data."""
    con = oracle(SMOKE_SF)
    n_fact = td._fact_rows(spark, SMOKE_SF)
    sdf = td.generate_frame(spark, name, n_fact)
    rel = con.sql(td.compose_oracle(f"SELECT * FROM {name}"))
    ok, msg = compare(sdf, rel)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(td.TPCDS_GEN_TABLES))
def test_generated_schema_conforms_to_spec(spark, name):
    """Generated columns must be a subset of the full TPCDS_TABLES DDL
    (tpcds.py, mirroring TPCDSDataLoad.scala:163-702) with compatible
    types — same family: any int width for int, any precision for
    decimal, string for char/varchar."""
    assert name in TPCDS_TABLES, name
    spec_fields = {f.name: f.dataType.simpleString() for f in struct_type(name).fields}
    gen = td.generate_frame(spark, name, 10)
    for f in gen.schema.fields:
        assert f.name in spec_fields, f"{name}.{f.name} not in TPC-DS spec"
        spec_t = spec_fields[f.name]
        got = f.dataType.simpleString()
        if spec_t.startswith("decimal"):
            assert got.startswith("decimal"), (f.name, got, spec_t)
        elif spec_t in ("int", "bigint", "smallint"):
            assert got in ("int", "bigint", "smallint"), (f.name, got, spec_t)
        else:
            assert got == spec_t, (f.name, got, spec_t)


def test_fact_rows_scale_with_sf(spark):
    """Fact tables derive their row count from orders, so the generated
    volume scales with the driver's SF instead of being fixed."""
    n = td._fact_rows(spark, SMOKE_SF)
    assert n > 0
    df = td.generate_frame(spark, "store_sales", n)
    assert df.count() == n


def test_materialize_is_cached_per_sf(spark):
    """materialize() writes once per (process, sf_dir) and reuses the
    directory afterwards — queries share one parquet copy."""
    d1 = td.materialize(spark, SMOKE_SF)
    d2 = td.materialize(spark, SMOKE_SF)
    assert d1 == d2


def test_star_join_plan_broadcasts_dims(spark):
    """tpcds_q03's physical plan: the date_dim/item sides must broadcast
    (AQE/size-based — no hints in the text), and the filters must reach
    the parquet scans as PushedFilters."""
    from lhbench_spark.queries import all_queries

    df = all_queries()["tpcds_q03"].spark_fn(spark, SMOKE_SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "PushedFilters" in plan and "i_manufact_id" in plan, plan


def test_query_text_identical_both_engines(spark):
    """The oracle is the SAME text with generation CTEs prepended — no
    per-dialect query rewriting (the adaptation surface is confined to
    the generator's two dialect renders)."""
    from lhbench_spark.queries import all_queries
    from lhbench_spark.queries.tpcds_queries import _TEXTS, query_text

    for name in _TEXTS:
        qd = all_queries()[name]
        text = query_text(name).strip()
        if text.upper().startswith("WITH"):
            # compose_oracle merges the query's WITH into the gen CTEs
            text = text[4:].lstrip()
        assert text in qd.oracle, name


def test_view_families_do_not_collide(spark):
    """`customer` exists in BOTH the TPC-H testdata views and the
    generated TPC-DS views. Interleaving the two spark.sql families must
    re-register the overwritten name despite the registration memo —
    the memoized skip once left adhoc_* queries resolving the TPC-DS
    customer (no c_custkey) in bench iteration 2."""
    from lhbench_spark.queries import all_queries

    q = all_queries()
    q["adhoc_temp_view_join"].spark_fn(spark, SMOKE_SF).collect()  # tpch views
    q["tpcds_q03"].spark_fn(spark, SMOKE_SF).collect()  # overwrites `customer`
    # Must repair the namespace, not hit the stale memo:
    q["adhoc_temp_view_join"].spark_fn(spark, SMOKE_SF).collect()
    q["tpcds_q03"].spark_fn(spark, SMOKE_SF).collect()


def test_skewed_store_sales_matches_schema_and_head(spark):
    """The Zipf-head skew variant must keep store_sales' exact schema
    (so the real query texts run over it unchanged) and concentrate
    ~85% of rows on the three hot items, with the tail drawn from the
    default mixer."""
    out = td.materialize(spark, SMOKE_SF)
    base = spark.read.parquet(f"{out}/store_sales")
    skew_out = td.materialize_skewed_store_sales(spark, SMOKE_SF)
    skewed = spark.read.parquet(f"{skew_out}/store_sales")
    assert skewed.schema == base.schema
    n = skewed.count()
    assert n == base.count()
    hot = {sk for _, sk in td.SKEW_HOT_SHARES}
    n_hot = skewed.filter(skewed.ss_item_sk.isin(list(hot))).count()
    assert 0.80 <= n_hot / n <= 0.90, n_hot / n


def test_dstd_exact_stddev_bit_identical_across_engines(spark, oracle):
    """The _dstd exact-sums stddev (tpcds_queries.py) exists because r7's
    external gate showed engine-private float realizations (native
    STDDEV_SAMP, windowed-decimal-cast ratios) can differ in the last
    ulp under a different DuckDB build. Pin both halves of its claim:
    (a) BIT-IDENTICAL doubles from Spark and DuckDB running the same
    text (the decimal sums are exact, the IEEE chain is deterministic,
    sqrt is correctly rounded), and (b) numerically equal to the native
    stddev_samp within float tolerance (the algebraic form is the same
    statistic)."""
    import math

    from pyspark.sql import functions as F

    from lhbench_spark.catalog import table
    from lhbench_spark.queries.tpcds_queries import _dstd

    con = oracle(SMOKE_SF)
    text = (
        f"SELECT l_returnflag, {_dstd('l_quantity')} AS std_q "
        "FROM lineitem GROUP BY l_returnflag"
    )
    table(spark, SMOKE_SF, "lineitem").createOrReplaceTempView("lineitem")
    got = {r.l_returnflag: r.std_q for r in spark.sql(text).collect()}
    want = {f: s for f, s in con.sql(text).fetchall()}
    assert got == want, (got, want)  # exact, not approx — bit-identical

    native = {
        r.l_returnflag: r.std_native
        for r in table(spark, SMOKE_SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.stddev_samp("l_quantity").alias("std_native"))
        .collect()
    }
    for flag, v in got.items():
        assert math.isclose(v, native[flag], rel_tol=1e-6), (flag, v, native[flag])


def test_dstd_null_when_group_too_small(spark):
    """_dstd must reproduce stddev_samp's NULL contract: NULL for n<=1
    (and ignore NULL inputs in n)."""
    from lhbench_spark.queries.tpcds_queries import _dstd

    df = spark.createDataFrame(
        [("a", 7), ("b", 3), ("b", None), ("c", 1), ("c", 5)],
        "g string, x int",
    )
    df.createOrReplaceTempView("dstd_probe")
    rows = {
        r.g: r.s
        for r in spark.sql(
            f"SELECT g, {_dstd('x')} AS s FROM dstd_probe GROUP BY g"
        ).collect()
    }
    assert rows["a"] is None  # n == 1
    assert rows["b"] is None  # one non-null value
    assert rows["c"] == round((((5 - 3) ** 2 + (1 - 3) ** 2) / 1) ** 0.5, 9)
