"""Workload-runner smoke + semantics tests (small configs).

The value-level correctness of the underlying code paths is carried by
the oracle-checked registry entries (merge_micro_counts, csv_refresh_view,
file_count_answers, range_gen_table); here we exercise the full runners
end-to-end and assert their reported structure and invariants.
"""

from __future__ import annotations

from lhbench_spark.workloads import file_count, merge_micro, refresh
from tests.conftest import SMOKE_SF


def test_merge_micro_runner(spark):
    cfg = merge_micro.MergeMicroConfig(
        rows=20_000, num_splits=4, num_files=4, update_pct=0.02,
        insert_rows=500, rounds=2,
    )
    rep = merge_micro.run(spark, cfg)
    errs = [r for r in rep.query_results if r.error_msg]
    assert not errs
    names = {r.name for r in rep.query_results}
    assert {"load", "merge-1", "merge-2", "read-agg-1", "read-filter-2"} <= names
    # after 2 rounds of inserts the count read reflects the growth
    agg2 = next(r for r in rep.query_results if r.name == "read-agg-2")
    assert agg2.row_count == 1


def test_file_count_runner(spark):
    cfg = file_count.FileCountConfig(rows=10_000, file_counts=(4, 16), iterations=1)
    rep = file_count.run(spark, cfg)
    # per grid point: write time + 4 queries × (plan, exec)
    assert len(rep.extra_metrics) == 2 * (1 + 4 * 2)
    for k, v in rep.extra_metrics.items():
        assert v >= 0, k


def test_refresh_runner(spark):
    rep = refresh.run(spark, SMOKE_SF, refresh.RefreshConfig(rounds=2))
    errs = [(r.name, r.error_msg) for r in rep.query_results if r.error_msg]
    assert not errs
    assert {r.name for r in rep.query_results} >= {
        "load", "queries-before", "merge-1", "merge-2", "compact", "queries-after",
    }


def test_rand_sample_fraction_sane(spark):
    """rand(42) < 0.01 over lineitem samples ~1% (rows-only registry entry's
    sanity bound lives here)."""
    from lhbench_spark.queries.workloads import sample_rand_filter

    row = sample_rand_filter(spark, SMOKE_SF).collect()[0]
    total = 6001  # sf0.001 lineitem rows (TESTDATA.md ~6k, exact not needed)
    frac = row["sampled_rows"] / total
    assert 0.001 < frac < 0.05


def test_smoke_workload(spark):
    """TestBenchmark parity (TestBenchmark.scala:49-72): scalar SQL, db
    lifecycle, table write/read-back — all error-free, smoke-ok metric 1."""
    from lhbench_spark.workloads import smoke

    rep = smoke.run(spark)
    assert not [q for q in rep.query_results if q.error_msg]
    assert rep.extra_metrics["smoke-ok-bool"] == 1.0
