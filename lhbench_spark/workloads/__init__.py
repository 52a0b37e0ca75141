"""Workload analogs of the reference's four benchmark classes.

Each workload is a library function returning a
:class:`~lhbench_spark.harness.report.BenchmarkReport` (timings measured
with the same runner semantics as the reference: wall clock around
plan+execute+fetch, upper-median over iterations), plus a small
deterministic configuration registered as an oracle-checked query in
``lhbench_spark.queries.workloads``.

- merge_micro  — MergeMicroBenchmark.scala:95-307 analog
- file_count   — FileCountBenchmark.scala:95-337 analog
- refresh      — IncrementalTPCDSBenchmark.scala:97-351 analog
"""
